"""Canonical ERA5 / WeatherBench2 variable lists and name maps.

Same inventory as the reference (src/swift/data/constants.py:1-71,
src/swift/data/utils.py:1-141): 4 surface variables + 5 atmospheric
variables × 13 pressure levels = 69 model variables, plus 3 forcings.
"""

DEFAULT_PRESSURE_LEVELS = [
    50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000,
]

SINGLE_LEVEL_VARS = [
    "2m_temperature",
    "10m_u_component_of_wind",
    "10m_v_component_of_wind",
    "mean_sea_level_pressure",
    "sea_surface_temperature",
]

PRESSURE_LEVEL_VARS = [
    "geopotential",
    "u_component_of_wind",
    "v_component_of_wind",
    "vertical_velocity",
    "wind_speed",
    "temperature",
    "relative_humidity",
    "specific_humidity",
    "vorticity",
    "potential_vorticity",
]

FORCING_VARS = [
    "toa_incident_solar_radiation",
    "geopotential_at_surface",
    "land_sea_mask",
]

# WB2 long name <-> shortname maps (subset used by eval/plotting).
NAME_TO_SHORTNAME = {
    "2m_temperature": "t2m",
    "10m_u_component_of_wind": "u10",
    "10m_v_component_of_wind": "v10",
    "mean_sea_level_pressure": "msl",
    "sea_surface_temperature": "sst",
    "geopotential": "z",
    "u_component_of_wind": "u",
    "v_component_of_wind": "v",
    "vertical_velocity": "w",
    "temperature": "t",
    "relative_humidity": "r",
    "specific_humidity": "q",
    "toa_incident_solar_radiation": "tisr",
    "geopotential_at_surface": "orography",
    "land_sea_mask": "lsm",
}
SHORTNAME_TO_NAME = {v: k for k, v in NAME_TO_SHORTNAME.items()}


def default_variables_69() -> list[str]:
    """The 69-variable canonical list (4 surface + 5 vars × 13 levels),
    ordering as in reference configs/data/era5-flare-1.4.yaml:9-78."""
    out = [
        "2m_temperature",
        "10m_u_component_of_wind",
        "10m_v_component_of_wind",
        "mean_sea_level_pressure",
    ]
    for var in [
        "geopotential",
        "u_component_of_wind",
        "v_component_of_wind",
        "temperature",
        "specific_humidity",
    ]:
        out += [f"{var}_{l}" for l in DEFAULT_PRESSURE_LEVELS]
    return out


def compress_variables(variables: list[str]) -> dict[str, list[int]]:
    """"geopotential_500" style names -> {base: [levels]}; surface vars get
    an empty level list (reference src/swift/utils/io.py:73-82)."""
    out: dict[str, list[int]] = {}
    for v in variables:
        parts = v.rsplit("_", 1)
        if len(parts) == 2 and parts[1].isdigit():
            out.setdefault(parts[0], []).append(int(parts[1]))
        else:
            out.setdefault(v, [])
    return out
