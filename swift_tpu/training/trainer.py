"""Trainer — jitted train step, EMA, kimg ticks, checkpoints, online val.

Functional re-design of the reference Trainer
(reference: src/swift/training/trainer.py:31-535):

  * the mutable net/optimizer/EMA become one ``TrainState`` pytree; one
    jitted+donated ``train_step(state, batch, key) -> state, metrics`` holds
    forward + backward + optimizer + EMA (the reference's separate
    ``_forward_step``/``_backward_step``/EMA-loop, :189-247);
  * DDP wrap (:76-84) is replaced by batch sharding over the mesh ``data``
    axis — XLA inserts the gradient reductions;
  * loss all_reduce per tick (:441-443) is unnecessary: the jitted loss is
    already a global mean over the sharded batch;
  * grad nan_to_num ±1e5 (:223-231), EMA half-life with ramp-up (:237-245),
    LR linear-warmup + cosine (:202-217, via optax schedule), kimg/tick
    bookkeeping, stats.jsonl, checkpoint naming — all preserved;
  * no GradScaler: bf16 on TPU needs no loss scaling (:66-75).

Multistep finetuning keeps the interval schedule in HOST control flow and
jits one step function per (steps, Δ) pair (SURVEY.md §7.3).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from swift_tpu.models.precond import BasePrecond, Network
from swift_tpu.training.loss import CRPSLoss, EDMLoss, MSELoss, SCMLoss
from swift_tpu.utils import stats
from swift_tpu.utils.checkpoint import get_ckpt_num, save_checkpoint, load_checkpoint
from swift_tpu.utils.io import get_logger, is_main_process

logger = get_logger(__name__)


class TrainState(NamedTuple):
    params: Any
    ema: Any
    opt_state: Any
    nimg: jnp.ndarray  # global images seen (float32 scalar)


# ----------------------------------------------------------------------------
# Schedules and param grouping (reference train.py:269-313, trainer.py:199-217)


def lr_schedule(
    base_lr: float,
    global_batch_size: int,
    lr_rampup_kimg: int = 10000,
    total_kimg: int = 200000,
    lr_min_factor: float = 0.01,
    lr_cosine_anneal: bool = True,
    resume_kimg: int = 0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Linear warmup + optional cosine anneal keyed on global nimg
    (reference trainer.py:202-217). Returns an optax schedule over the
    optimizer update count."""
    warmup_nimg = lr_rampup_kimg * 1000
    total_nimg = total_kimg * 1000
    min_lr = base_lr * lr_min_factor

    def schedule(count):
        nimg = resume_kimg * 1000 + count * global_batch_size
        warm = min_lr + (base_lr - min_lr) * (nimg / max(warmup_nimg, 1))
        if lr_cosine_anneal:
            progress = jnp.minimum(
                1.0, (nimg - warmup_nimg) / max(total_nimg - warmup_nimg, 1)
            )
            post = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * progress))
        elif warmup_nimg > 0:
            # the reference's if/elif (trainer.py:203-217) never touches the
            # group lr again once warmup ends and annealing is off: the lr
            # HOLDS at the value set by the LAST step with nimg < warmup —
            # slightly below base_lr on the gb step grid (from-zero grid; a
            # resume that lands mid-warmup off-grid shifts the held value by
            # < gb/warmup relative).
            last = (warmup_nimg - 1) // global_batch_size * global_batch_size
            post = min_lr + (base_lr - min_lr) * (last / warmup_nimg)
        else:
            post = base_lr
        return jnp.where(nimg < warmup_nimg, warm, post)

    return schedule


def reset_schedule_counts(opt_state):
    """Zero the optax ``scale_by_schedule`` counts after a FULL-state restore.

    The LR schedule already offsets by ``resume_kimg`` (factory.
    build_optimizer), so a restored schedule count would double-count
    training progress — warmup/anneal would jump ahead by ~2x (the reference
    recomputes LR from global_nimg each step, trainer.py:202-217). Adam/Muon
    moment counts are NOT touched: bias correction must continue from the
    restored step."""
    is_sched = lambda n: isinstance(n, optax.ScaleByScheduleState)
    return jax.tree_util.tree_map(
        lambda n: (
            optax.ScaleByScheduleState(count=jnp.zeros_like(n.count))
            if is_sched(n)
            else n
        ),
        opt_state,
        is_leaf=is_sched,
    )


def adamw_decay_mask(params) -> Any:
    """True (decay) except pos_embed and norm scales/biases outside
    modulation (reference train.py:274-285)."""

    def label(path):
        joined = "/".join(str(getattr(p, "key", p)) for p in path)
        if "pos_embed" in joined:
            return False
        if "norm" in joined and "modulation" not in joined:
            return False
        return True

    return jax.tree_util.tree_map_with_path(lambda p, _: label(p), params)


def muon_param_labels(params) -> Any:
    """"muon" for >=2-D params inside the transformer blocks, "adam"
    otherwise (reference train.py:296-311 keys on
    ``ndim >= 2 and "transformer" in name``; our blocks are named block{i}).

    Deliberate divergence: the per-head attention logit ``scale`` goes to
    Adam here. The reference stores it as (1, heads, 1, 1) so its ndim>=2
    rule orthogonalizes it (Newton-Schulz on a 1×heads matrix merely
    normalizes the direction); ours is (heads,) unrolled / (pairs, heads)
    stacked, where Muon's matrix semantics don't apply — and a stacked NS
    would couple heads across layers. Adam on a per-head gain is the sane
    assignment; documented here because it changes that one parameter's
    training dynamics vs the reference."""

    def label(path, leaf):
        joined = "/".join(str(getattr(p, "key", p)) for p in path)
        if "pairs" in joined:
            # scan-over-layers stack: a leading layer axis inflates ndim by
            # one, so a stacked matrix is >=3-D (stacked scales/norms are
            # 2-D and stay on adam).
            return "muon" if leaf.ndim >= 3 else "adam"
        if leaf.ndim >= 2 and "block" in joined:
            return "muon"
        return "adam"

    return jax.tree_util.tree_map_with_path(label, params)


def swin_flop_count(
    img_shape, batch_size, depth, num_channels, hidden_size,
    ffn_hidden_size, patch_size, window_size,
) -> int:
    """Analytic FLOP model (reference models/swin.py:27-54): 6·fwd_flop =
    3 (fwd+bwd) × 2 (MAC)."""
    img_h, img_w = img_shape
    p_dim = patch_size[0] * patch_size[1]
    seqlen = window_size[0] * window_size[1]
    nwindows = batch_size * img_h * img_w / seqlen / p_dim
    pre_post = 2 * nwindows * p_dim * num_channels * hidden_size
    qkvo = 4 * nwindows * seqlen * hidden_size**2
    fa = 2 * nwindows * seqlen**2 * hidden_size
    glu = 3 * nwindows * seqlen * ffn_hidden_size * hidden_size
    fwd = (qkvo + fa + glu) * depth + pre_post
    return int(6 * fwd)


def clamp_grads(grads):
    """NaN/Inf gradient defense: nan -> 0, ±inf -> ±1e5, elementwise
    (reference trainer.py:223-231 — torch.nan_to_num with the same
    constants). Applied to the raw grads before the optimizer update."""
    return jax.tree_util.tree_map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), grads
    )


def ema_update(ema, params, nimg, global_batch_size,
               ema_halflife_kimg, ema_rampup_ratio):
    """EMA with half-life ramp-up (reference trainer.py:237-245):
    halflife_nimg is capped at ``nimg * rampup`` (pre-increment nimg, the
    images seen BEFORE this step), beta = 0.5^(batch/halflife), and
    ema <- params + beta·(ema - params) — torch's ``lerp(ema, beta)``."""
    halflife = ema_halflife_kimg * 1000
    if ema_rampup_ratio is not None:
        halflife = jnp.minimum(halflife, nimg * ema_rampup_ratio)
    beta = 0.5 ** (global_batch_size / jnp.maximum(halflife, 1e-8))
    return jax.tree_util.tree_map(
        lambda e, p: p + beta * (e - p), ema, params
    )


# ----------------------------------------------------------------------------


class Trainer:
    def __init__(
        self,
        precond: BasePrecond,
        optimizer: optax.GradientTransformation,
        loss_fn,
        *,
        global_batch_size: int,
        total_kimg: int = 200000,
        ema_halflife_kimg: int = 500,
        ema_rampup_ratio: Optional[float] = 0.05,
        kimg_per_tick: int = 50,
        checkpoint_ticks: Optional[int] = 50,
        val_ticks: Optional[int] = 50,
        val_target_interval: int = 56,
        val_variables: Optional[list[str]] = None,
        val_crps_members: int = 0,
        solver_kwargs: Optional[dict] = None,
        finetune_kwargs: Optional[dict] = None,
        teacher: Optional[Network] = None,
        run_dir: str = ".",
        ckpt: Optional[str] = None,
        flop_count: Optional[int] = None,
        seed: int = 0,
        profile: bool = False,
        lr_fn=None,  # update-count -> lr, for tick logging (reference :463)
        grad_accum: int = 1,
    ):
        self.precond = precond
        self.optimizer = optimizer
        self.loss_fn = loss_fn
        self.global_batch_size = global_batch_size
        self.total_kimg = total_kimg
        self.ema_halflife_kimg = ema_halflife_kimg
        self.ema_rampup_ratio = ema_rampup_ratio
        self.kimg_per_tick = kimg_per_tick
        self.checkpoint_ticks = checkpoint_ticks
        self.val_ticks = val_ticks
        self.val_target_interval = val_target_interval
        self.val_variables = val_variables
        # opt-in ensemble CRPS during online val (beyond the reference,
        # whose online val is RMSE-only — validate.py:23-127; CRPS exists
        # only in its offline eval). 0 = off; >=2 = members per IC.
        self.val_crps_members = int(val_crps_members)
        self.solver_kwargs = dict(solver_kwargs or {})
        self.finetune_kwargs = dict(finetune_kwargs or {})
        self.teacher = teacher
        self.run_dir = run_dir
        self.flop_count = flop_count
        self.seed = seed
        self.profile = profile
        self.lr_fn = lr_fn
        # Microbatch gradient accumulation (beyond the reference, which does
        # one fwd/bwd per optimizer step — SURVEY.md §2.3): the device batch
        # is split into `grad_accum` microbatches scanned sequentially, so
        # activation memory scales with the MICRObatch while optimizer
        # dynamics see the full batch. The lever for large effective batches
        # on one chip (e.g. 0.25°, where a 16 GB v5e fits batch 1).
        assert grad_accum >= 1
        self.grad_accum = int(grad_accum)
        self.solver_type = "edm" if isinstance(loss_fn, EDMLoss) else "dpm"
        from swift_tpu.utils.wandb_utils import History

        self.history = History()

        # ---- state init / resume (reference trainer.py:98-116)
        params = precond.init(jax.random.PRNGKey(seed))
        opt_state = optimizer.init(params)
        ema = jax.tree_util.tree_map(jnp.copy, params)
        self.resume_kimg = 0
        if ckpt is not None:
            template = {"params": params, "ema": ema, "opt_state": opt_state}
            try:
                restored = load_checkpoint(ckpt, template)
                params, ema, opt_state = (
                    restored["params"], restored["ema"], restored["opt_state"],
                )
                # the lr schedule offsets by resume_kimg; the restored
                # schedule count would double-count progress (ADVICE r1).
                opt_state = reset_schedule_counts(opt_state)
            except (KeyError, ValueError) as e:
                # graceful degradation: keep weights, fresh optimizer
                logger.warning(f"Could not load full state ({e}); loading weights only.")
                restored = load_checkpoint(ckpt, {"params": params, "ema": ema})
                params, ema = restored["params"], restored["ema"]
            self.resume_kimg = get_ckpt_num(ckpt)
        self.state = TrainState(
            params, ema, opt_state, jnp.float32(self.resume_kimg * 1000)
        )

        if self.finetune_kwargs.get("name") == "multistep":
            cum = self.resume_kimg
            intervals = [dict(iv) for iv in self.finetune_kwargs["intervals"]]
            for iv in intervals:
                cum += iv["kimg"]
                iv["kimg"] = cum
            self.finetune_kwargs["intervals"] = intervals
            logger.info(f"finetune schedule: {self.finetune_kwargs}")

        self._step_cache: dict = {}

    # ------------------------------------------------------------------
    def _loss_kwargs(self, state, batch, steps: int, delta: Optional[int],
                     teacher_params=None):
        if isinstance(self.loss_fn, SCMLoss):
            teacher = None
            if self.teacher is not None:
                # rebuild the teacher callable from params passed THROUGH
                # the jit boundary — a closed-over Network would bake the
                # teacher weights into the HLO as constants (see
                # param_sampler_factory for the same rule).
                teacher = Network(self.teacher.precond, teacher_params)
            return dict(step=state.nimg, teacher=teacher)
        if isinstance(self.loss_fn, MSELoss):
            return dict(steps=steps)
        if isinstance(self.loss_fn, CRPSLoss):
            return dict(
                steps=steps, delta=delta, forcings_seq=batch["forcings_seq"]
            )
        return {}

    def _make_train_step(self, steps: int, delta: Optional[int]):
        loss_fn = self.loss_fn
        optimizer = self.optimizer
        gb = float(self.global_batch_size)
        rampup = self.ema_rampup_ratio

        accum = self.grad_accum

        def step_fn(state: TrainState, batch: dict, key: jax.Array,
                    teacher_params=None):
            def compute(params, mb, k):
                return loss_fn(
                    params,
                    k,
                    mb["t"],
                    condition=mb["x"],
                    auxiliary=mb["delta"],
                    **self._loss_kwargs(state, mb, steps, delta,
                                        teacher_params),
                )

            if accum > 1:
                # scan over microbatches; grads accumulate in param dtype
                # (fp32). Loss/grads are means over the full device batch
                # (each microbatch loss is already a per-sample mean).
                def split_mb(a):
                    if a.shape[0] % accum:
                        raise ValueError(
                            f"grad_accum={accum} requires every batch leaf's "
                            f"leading (batch) dim to be divisible by it; got "
                            f"shape {a.shape}"
                        )
                    return a.reshape(accum, a.shape[0] // accum, *a.shape[1:])

                mbs = jax.tree_util.tree_map(split_mb, batch)
                keys = jax.random.split(key, accum)

                def body(carry, inp):
                    g_acc, l_acc = carry
                    mb, k = inp
                    l, g = jax.value_and_grad(compute)(state.params, mb, k)
                    g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                    return (g_acc, l_acc + l), None

                zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
                (g_sum, l_sum), _ = jax.lax.scan(
                    body, (zeros, jnp.float32(0.0)), (mbs, keys)
                )
                grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
                loss = l_sum / accum
            else:
                loss, grads = jax.value_and_grad(compute)(
                    state.params, batch, key
                )
            # NaN/Inf defense (reference trainer.py:223-231).
            grads = clamp_grads(grads)
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)

            # EMA half-life with ramp-up (reference trainer.py:237-245).
            ema = ema_update(
                state.ema, params, state.nimg, gb,
                self.ema_halflife_kimg, rampup,
            )
            new_state = TrainState(params, ema, opt_state, state.nimg + gb)
            gnorm = optax.global_norm(grads)
            return new_state, {"loss": loss, "grad_norm": gnorm}

        return jax.jit(step_fn, donate_argnums=(0,))

    def _get_step(self, steps: int, delta: Optional[int]):
        key = (steps, delta)
        if key not in self._step_cache:
            self._step_cache[key] = self._make_train_step(steps, delta)
        return self._step_cache[key]

    # ------------------------------------------------------------------
    def _val_step(self, val_batches_fn, val_dataset, cur_tick, global_nimg, val_jsonl):
        from swift_tpu.sampling.factory import param_sampler_factory
        from swift_tpu.training.validate import RMSE_rollout

        sampler = param_sampler_factory(
            self.solver_type, self.precond, **self.solver_kwargs
        )
        agg, arr = RMSE_rollout(
            sampler,
            self.state.ema,
            val_batches_fn(),
            val_dataset,
            self.val_target_interval,
            jax.random.PRNGKey(self.seed + cur_tick),
            num_batches=1,
        )
        variables = val_dataset.variables
        var_map = dict(zip(variables, arr))
        selected = self.val_variables or variables
        selected = [v for v in selected if v in var_map] or variables

        # per-variable per-day wandb metrics (reference trainer.py:282-293)
        n_days = arr.shape[1]
        wandb_val = {"train/kimg": int(global_nimg / 1e3)}
        for v in selected:
            for day in range(n_days):
                desc = "6h" if day == 0 else f"{day}day"
                wandb_val[f"val/rmse/{desc}/{v}"] = float(var_map[v][day])

        val_metrics = {
            "train/kimg": int(global_nimg / 1e3),
            "val/tick": cur_tick,
            **{f"val/rmse/{v}": [float(x) for x in var_map[v]] for v in selected},
            "val/rmse": float(agg),
        }

        if self.val_crps_members >= 2:
            from swift_tpu.training.validate import CRPS_rollout

            cagg, carr = CRPS_rollout(
                sampler,
                self.state.ema,
                val_batches_fn(),
                val_dataset,
                self.val_target_interval,
                jax.random.PRNGKey(self.seed + cur_tick),
                members=self.val_crps_members,
                num_batches=1,
            )
            cvar = dict(zip(variables, carr))
            val_metrics.update(
                {f"val/crps/{v}": [float(x) for x in cvar[v]] for v in selected}
            )
            val_metrics["val/crps"] = float(cagg)
            for v in selected:
                for day in range(n_days):
                    desc = "6h" if day == 0 else f"{day}day"
                    wandb_val[f"val/crps/{desc}/{v}"] = float(cvar[v][day])

        self.history.update(wandb_val, precision=4)
        logger.info(val_metrics)
        if is_main_process() and val_jsonl is not None:
            val_jsonl.write(json.dumps(val_metrics) + "\n")
            val_jsonl.flush()

    # ------------------------------------------------------------------
    def train(self, train_batches, val_batches=None, val_dataset=None):
        """``train_batches``: iterator of batch dicts (see data.pipeline).
        ``val_batches``: callable returning an iterator of (X, TS, idx)."""
        logger.info(f"Training for {self.total_kimg} kimg...")
        stats_jsonl = val_jsonl = None
        if is_main_process():
            os.makedirs(self.run_dir, exist_ok=True)
            stats_jsonl = open(os.path.join(self.run_dir, "stats.jsonl"), "at")
            val_jsonl = open(os.path.join(self.run_dir, "val_stats.jsonl"), "at")

        cur_tick = 0
        global_nimg = self.resume_kimg * 1000
        tick_start_nimg = global_nimg
        start_time = time.perf_counter()
        tick_start_time = start_time
        dt_misc = 0.0
        i = j = 0
        rng = jax.random.PRNGKey(self.seed)

        it = iter(train_batches)
        steps = None
        metrics_dev = None
        dt_step = 0.0
        dt_data_tick = 0.0  # per-tick accumulated data wait (reference :445-459)
        # Bounded async window: without any intra-tick sync the host can
        # enqueue a whole tick of steps, keeping every step's argument
        # buffers (~290 MB/batch at the flagship) referenced until the next
        # device sync. Blocking on the metrics of the step K back keeps
        # data-load/compute overlap (the device stays K steps deep) while
        # bounding genuinely in-flight host memory. NOTE: the ~18 GB/tick
        # host-RSS growth on the r3 dev-harness soak is NOT this — it
        # reproduces with the same host buffers re-sent synchronously
        # (scripts/probe_host_rss.py: ~306 MB/step = exactly the transfer
        # payload, in reuse/fresh/async/device_put modes alike), i.e. the
        # dev tunnel's transfer client retains every payload; production
        # PJRT hosts don't have that path. See PERF.md.
        from collections import deque

        inflight: deque = deque()
        inflight_depth = 4

        if self.profile:
            jax.profiler.start_trace(os.path.join(self.run_dir, "profile"))

        # fault tolerance: a SIGTERM/SIGINT (preemption, maintenance event)
        # requests a checkpoint at the next tick boundary instead of dying
        # mid-step — the in-process half of the job-level chain-resume story
        # (reference relies solely on PBS afterany chains,
        # scripts/chain-resume.sh:37-43).
        interrupted = {"flag": False}
        prev_handlers = {}
        import signal

        def _request_stop(signum, frame):
            logger.warning(f"signal {signum}: checkpointing at next tick")
            interrupted["flag"] = True

        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[sig] = signal.signal(sig, _request_stop)
        except ValueError:
            prev_handlers = {}  # not on the main thread (tests)

        while True:
            t0_iter = time.perf_counter()

            # multistep finetune interval switching (reference :352-376)
            if self.finetune_kwargs.get("name") == "multistep":
                intervals = self.finetune_kwargs["intervals"]
                interval = intervals[0]
                if steps is None:
                    steps = interval["steps"]
                    if hasattr(train_batches, "set_offset"):
                        train_batches.set_offset(steps)
                        it = iter(train_batches)
                elif global_nimg > interval["kimg"] * 1000 and len(intervals) > 1:
                    intervals.pop(0)
                    interval = intervals[0]
                    steps = interval["steps"]
                    logger.info(f"Switching to interval {interval}")
                    if hasattr(train_batches, "set_offset"):
                        train_batches.set_offset(steps)
                        it = iter(train_batches)
            else:
                steps = 1

            t0 = time.perf_counter()
            batch = next(it)
            dt_data_tick += time.perf_counter() - t0

            delta = None
            if isinstance(self.loss_fn, CRPSLoss):
                delta = int(round(float(np.asarray(batch["delta"]).reshape(-1)[0]) * 10))

            rng, key = jax.random.split(rng)
            t0 = time.perf_counter()
            step_fn = self._get_step(steps, delta)
            self.state, metrics_dev = step_fn(
                self.state, batch, key,
                self.teacher.params if self.teacher is not None else None,
            )
            i += 1
            global_nimg += self.global_batch_size
            inflight.append(metrics_dev)
            if len(inflight) > inflight_depth:
                jax.block_until_ready(inflight.popleft())
            done = global_nimg >= self.total_kimg * 1000 or interrupted["flag"]

            if (
                (not done)
                and (cur_tick != 0)
                and (global_nimg < tick_start_nimg + self.kimg_per_tick * 1000)
            ):
                j += 1
                continue

            # block for real timing at tick boundaries only
            metrics_host = jax.tree_util.tree_map(float, metrics_dev)
            dt_step = time.perf_counter() - t0

            if (
                self.val_ticks is not None
                and val_batches is not None
                and cur_tick % self.val_ticks == 0
            ):
                self._val_step(
                    val_batches, val_dataset, cur_tick, global_nimg, val_jsonl
                )

            tick_end_time = time.perf_counter()
            dt_tick = tick_end_time - tick_start_time
            nimg_tick = global_nimg - tick_start_nimg
            iters_tick = nimg_tick // self.global_batch_size
            tflops = (
                (iters_tick * self.flop_count / dt_tick) / 1e12
                if self.flop_count
                else 0.0
            )

            mem_gb = 0.0
            try:
                ms = jax.local_devices()[0].memory_stats()
                if ms:
                    mem_gb = ms.get("peak_bytes_in_use", 0) / 2**30
            except Exception:
                pass
            try:
                import psutil

                cpu_mem_gb = psutil.Process(os.getpid()).memory_info().rss / 2**30
            except Exception:
                cpu_mem_gb = 0.0

            metrics = {
                "train/tick": cur_tick,
                "train/iter": i,
                "train/jter": j,
                "train/loss": metrics_host["loss"],
                "train/grad_norm": metrics_host["grad_norm"],
                "train/kimg": int(global_nimg / 1e3),
                "train/tflops": tflops,
                "train/dt/dt": tick_end_time - start_time,
                "train/dt/tick": dt_tick,
                "train/dt/iter": tick_end_time - t0_iter,
                "train/dt/data": dt_data_tick,
                "train/dt/step": dt_step,
                "train/dt/misc": dt_misc,
                "train/dt/kimg": 1e3 * dt_tick / max(nimg_tick, 1),
                "train/mem/device": mem_gb,
                "train/mem/cpu": cpu_mem_gb,
            }
            if self.lr_fn is not None:
                count = (global_nimg - self.resume_kimg * 1000) // self.global_batch_size
                metrics["train/lr"] = float(self.lr_fn(count))
            logger.info(
                self.history.update(metrics, precision=4)
                .replace("train/", "")
                .replace("dt/", "")
                .replace("mem/", "")
            )
            for k, v in metrics.items():
                stats.report0(k, v)
            stats.default_collector.update()
            if is_main_process() and stats_jsonl is not None:
                stats_jsonl.write(json.dumps(stats.default_collector.as_dict()) + "\n")
                stats_jsonl.flush()

            # a signal-requested stop checkpoints even when periodic
            # checkpointing is disabled — the handler promised one.
            want_ckpt = interrupted["flag"] or (
                self.checkpoint_ticks is not None
                and (done or (cur_tick % self.checkpoint_ticks == 0 and cur_tick != 0))
            )
            if want_ckpt and is_main_process():
                self.save_checkpoint(global_nimg)

            cur_tick += 1
            tick_start_nimg = global_nimg
            dt_data_tick = 0.0
            tick_start_time = time.perf_counter()
            dt_misc = tick_start_time - tick_end_time
            if done:
                if self.profile:
                    jax.profiler.stop_trace()
                import signal

                for sig, h in prev_handlers.items():
                    signal.signal(sig, h)
                if interrupted["flag"]:
                    logger.warning("stopped by signal; checkpoint saved — "
                                   "resume with resume=<this run id>")
                hours = (tick_end_time - start_time) / 3600
                logger.info(f"Finished training in {hours:.2f} hours")
                if stats_jsonl is not None:
                    stats_jsonl.close()
                if val_jsonl is not None:
                    val_jsonl.close()
                if is_main_process():
                    self.history.finalize(
                        os.path.join(self.run_dir, "outputs"), "train"
                    )
                return self.state

    def save_checkpoint(self, cur_nimg: int):
        path = os.path.join(
            self.run_dir, "checkpoints", f"checkpoint-{cur_nimg // 1000:06d}.npz"
        )
        logger.info(f"Saving checkpoint: {path}")
        save_checkpoint(
            path,
            {
                "ema": self.state.ema,  # inference artifact
                "params": self.state.params,
                "opt_state": self.state.opt_state,
            },
        )
