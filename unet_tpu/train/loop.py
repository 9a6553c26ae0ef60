"""The training engine: jitted one-cycle fit over a data-parallel mesh.

TPU-native replacement for the reference's fastai training stack
(train.py:163-283 ``train_unet`` + train.py:287-373 ``train_func``):

* one fused XLA program per step — on-device augmentation, bf16
  forward/backward, loss, Adam update and LR/momentum schedule all inside a
  single donated jit; batch-norm statistics sync across the mesh because the
  batch axis is sharded under GSPMD
* epoch validation with exact padded-batch masking, streaming
  fastai-semantics metrics (DiceMulti / rmse / R²)
* SaveModelCallback equivalent: monitor + comparator, best weights kept and
  restored at the end (train.py:198-209)
* CSVLogger-schema history (epoch,train_loss,valid_loss,<metrics>,time) with
  fastai's smoothed train loss
* LR finder (exponential sweep + 4 suggesters, utils.py:150-167)
* transfer learning from an exported bundle (train.py:224-229)
* orbax step checkpoints for resume — the failure-recovery upgrade the
  reference lacks
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field, replace
from functools import partial
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data import (
    AugmentConfig,
    NOOP_AUGMENT,
    TileDataset,
    TileLoader,
    augment_batch,
    get_datatype,
    resolve_class_weights,
)
from ..models import build_unet
from ..models.unet import TPU_OPT_TOPOLOGY_VERSION
from ..parallel.mesh import make_mesh, prefetch_to_mesh, replicate_tree
from . import checkpoint as ckpt
from . import metrics as M
from .losses import build_loss, fold_loss_layout
from .optimizer import constant_lr_adam, one_cycle_adam
from .schedule import lr_finder_lrs, suggest_lr


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclass
class TrainerConfig:
    """Mirrors the reference's training parameter surface
    (params_and_main.py:46-104) plus TPU-native knobs."""

    data_path: Union[str, Path] = "."
    model_path: Union[str, Path] = "."
    description: str = "model"
    batch_size: int = 4
    epochs: int = 15
    lr: float = 1e-4
    arch: str = "xresnet34"
    codes: Sequence[str] = ("background", "foreground")
    regression: bool = False
    class_weights: Union[str, Sequence[float]] = "even"
    encoder_factor: float = 10.0
    lr_finder: Optional[str] = None
    loss_func: Optional[str] = None
    monitor: Optional[str] = None
    self_attention: bool = False
    valid_scenes: Sequence[str] = ("vali",)
    transforms: bool = True
    split_idx: Optional[int] = 0
    n_transform_imgs: float = 1.0
    aug: AugmentConfig = field(default_factory=AugmentConfig)
    existing_model: Optional[str] = None
    pretrained_weights: Optional[str] = None  # torch xresnet state_dict (.pth)
    export_model_summary: bool = False
    visualize_data_example: bool = False
    info: str = ""
    class_zero: bool = False
    # TPU-native knobs
    normalize: str = "reference"
    reference_quirks: bool = False
    # The TPU-optimized topology (space-to-depth stem, conv-transpose
    # upsampling, slim 128-lane decoder, half-res tail — models/unet.py) is
    # the DEFAULT: 2.4x the training throughput of the reference-shaped
    # decoder at quality parity on the aerial fixture (multi-seed gates in
    # tests/test_quality_parity.py). tpu_opt=False selects the topology
    # whose parameter structure mirrors fastai DynamicUnet exactly (needed
    # for bit-faithful comparisons and pretrained-stem grafting).
    tpu_opt: bool = True
    bf16: bool = True
    seed: int = 0
    loader_threads: int = 8
    checkpoint_every: int = 0  # epochs; 0 = off
    resume: bool = False
    devices: Optional[Sequence[Any]] = None
    # Shard tile HEIGHT over this many devices per batch shard (2-D
    # (data, space) mesh — parallel/mesh.py): GSPMD spatially partitions
    # every conv with halo exchanges and turns batch-norm statistics into
    # cross-chip reduces automatically. For training tiles too large for
    # one chip's HBM; equality with the unsharded step is pinned in
    # tests/test_spatial.py.
    spatial: int = 1
    # Split each batch into this many sequential microbatches inside one
    # jitted step (lax.scan): gradients average exactly (mean-of-means ==
    # full mean for equal microbatches), activations are allocated per
    # MICRObatch, so effective batch sizes beyond one chip's HBM train
    # without remat. BatchNorm uses per-microbatch statistics (torch
    # grad-accum semantics). batch_size must divide evenly.
    grad_accum: int = 1
    profile_dir: Optional[str] = None  # jax.profiler trace of epoch 0


def _choose_devices(batch_size: int, devices, spatial: int = 1,
                    grad_accum: int = 1) -> list:
    """Largest device count whose data-axis share evenly divides the batch
    (the MICRObatch under gradient accumulation — every scan iteration must
    shard evenly); returns ``n_data * spatial`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if spatial > 1 and len(devices) < spatial:
        raise ValueError(
            f"spatial={spatial} needs that many devices, have {len(devices)}")
    micro = batch_size // max(1, grad_accum)
    n = len(devices) // max(1, spatial)
    while n > 1 and micro % n != 0:
        n -= 1
    return devices[:n * max(1, spatial)]


def _monitor_defaults(monitor: Optional[str], regression: bool) -> Tuple[str, Callable]:
    """train.py:198-208: default monitor + min/max comparator."""
    if monitor is None:
        monitor = "r2_score" if regression else "dice_multi"
    if monitor in ("train_loss", "valid_loss"):
        comp = np.less
    else:
        comp = np.greater
        if monitor not in ("r2_score", "dice_multi", "rmse"):
            import warnings

            warnings.warn("Monitor not recognised. Assuming maximization.")
    return monitor, comp


def _fmt_time(seconds: float) -> str:
    s = int(round(seconds))
    return f"{s // 60:02d}:{s % 60:02d}"


class Trainer:
    def __init__(self, cfg: TrainerConfig):
        from ..utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        if cfg.grad_accum > 1 and cfg.batch_size % cfg.grad_accum:
            raise ValueError(
                f"batch_size {cfg.batch_size} must divide into "
                f"grad_accum={cfg.grad_accum} microbatches")
        if cfg.existing_model:
            # transfer learning: the bundle defines the architecture (the
            # reference's load_learner keeps the pickled model, train.py:225)
            # — adopt its topology fields so cfg defaults can't mismatch the
            # loaded parameter structure
            _, mpath, _ = ckpt.bundle_paths(cfg.existing_model)
            m = ckpt.load_manifest(mpath)
            adopted = {}
            for field_name, key in (("arch", "ARCHITECTURE"),
                                    ("tpu_opt", "tpu_opt"),
                                    ("self_attention", "self_attention")):
                v = m.get(key)
                if v is not None and getattr(cfg, field_name) != v:
                    adopted[field_name] = v
            if adopted:
                print(f"existing_model: adopting bundle topology {adopted}")
                cfg = replace(cfg, **adopted)
        self.cfg = cfg
        self.data_path = Path(cfg.data_path)
        self.dataset = TileDataset(self.data_path, valid_scenes=cfg.valid_scenes,
                                   regression=cfg.regression,
                                   reference_quirks=cfg.reference_quirks)
        self.dtype_str = get_datatype(self.data_path)
        self.mesh = make_mesh(
            _choose_devices(cfg.batch_size, cfg.devices, cfg.spatial,
                            cfg.grad_accum),
            spatial=cfg.spatial)

        self.train_loader = TileLoader(
            self.dataset, self.dataset.train_files, cfg.batch_size,
            shuffle=True, drop_last=True, seed=cfg.seed, n_threads=cfg.loader_threads,
        )
        self.valid_loader = TileLoader(
            self.dataset, self.dataset.valid_files, cfg.batch_size,
            shuffle=False, drop_last=False, n_threads=cfg.loader_threads,
        )
        if len(self.train_loader) == 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} exceeds {self.dataset.n_train} training tiles"
            )
        if self.dataset.n_valid == 0:
            raise ValueError(
                f"No validation tiles: no scene folder named {list(cfg.valid_scenes)} "
                f"under {self.data_path} contains img_tiles"
            )

        sample_img, _ = self.dataset.load_pair(self.dataset.train_files[0])
        self.c_in = sample_img.shape[0]
        self.tile_hw = sample_img.shape[1:]
        self.n_out = 1 if cfg.regression else len(cfg.codes)

        if cfg.tpu_opt and (self.tile_hw[0] % 4 or self.tile_hw[1] % 4):
            # CONFIG-level fallback (decided here, before the model is
            # built, so the manifest stamps the topology actually trained —
            # never a traced-shape branch inside the model, which raises)
            print(f"Tile size {self.tile_hw} not divisible by 4: tpu_opt "
                  "topology unavailable — using the parity topology "
                  "(tpu_opt=False). Pad tiles to a multiple of 4 to use the "
                  "TPU-optimized decoder.")
            cfg = replace(cfg, tpu_opt=False)
            self.cfg = cfg

        self.model = build_unet(
            arch=cfg.arch, n_out=self.n_out, c_in=self.c_in,
            self_attention=cfg.self_attention, tpu_opt=cfg.tpu_opt,
            dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
        )

        self.class_weights = resolve_class_weights(
            cfg.class_weights, cfg.codes, self.data_path, cfg.regression,
            reference_quirks=cfg.reference_quirks,
        )
        weight_arr = None if cfg.regression else jnp.asarray(self.class_weights, jnp.float32)
        self.loss_fn = build_loss(cfg.loss_func, cfg.regression, weight_arr)
        self.monitor, self.comp = _monitor_defaults(cfg.monitor, cfg.regression)
        self.aug_cfg = cfg.aug if cfg.transforms else NOOP_AUGMENT
        self.steps_per_epoch = len(self.train_loader)
        self.total_steps = self.steps_per_epoch * cfg.epochs
        self.history: List[Dict[str, Any]] = []
        self._step_fns: Dict[int, Tuple[Callable, Callable]] = {}
        from ..utils.profiling import StepTimer

        self.timer = StepTimer()

    def close(self) -> None:
        self.train_loader.close()
        self.valid_loader.close()

    # --- state ----------------------------------------------------------------

    def init_variables(self) -> Dict[str, Any]:
        if self.cfg.existing_model:
            _, variables, _ = ckpt.load_bundle(self.cfg.existing_model)
            return variables
        x = jnp.zeros((1, *self.tile_hw, self.c_in), jnp.float32)
        init_fn = jax.jit(partial(self.model.init, train=False))
        variables = init_fn(jax.random.PRNGKey(self.cfg.seed), x)
        if self.cfg.pretrained_weights:
            # the reference's pretrained=True (train.py:128): ImageNet
            # xresnet encoder weights — either a torch state_dict (.pth) or
            # a pre-converted .npz from `python -m unet_tpu import-weights`
            from ..models.torch_import import load_encoder_any

            variables = load_encoder_any(
                jax.tree_util.tree_map(np.asarray, variables),
                self.cfg.pretrained_weights, self.cfg.arch,
            )
        return variables

    def init_state(self, total_steps: Optional[int] = None, lr: Optional[float] = None) -> TrainState:
        variables = self.init_variables()
        self.tx, _ = one_cycle_adam(
            variables["params"],
            lr if lr is not None else self.cfg.lr,
            total_steps if total_steps is not None else self.total_steps,
            encoder_factor=self.cfg.encoder_factor,
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(variables["params"]),
        )
        return replicate_tree(self.mesh, state)

    # --- jitted steps -----------------------------------------------------------

    def _build_steps(self, tx) -> Tuple[Callable, Callable]:
        model, loss_fn, cfg = self.model, self.loss_fn, self.cfg
        regression = cfg.regression
        aug_cfg, dtype_str = self.aug_cfg, self.dtype_str

        def forward_loss(params, batch_stats, images, masks, train, sample_mask=None):
            variables = {"params": params, "batch_stats": batch_stats}
            if train:
                # fold_logits: tpu_opt emits pre-shuffle (B,H/2,W/2,4C)
                # logits and the loss runs in the folded layout (exact same
                # value — losses.fold_loss_layout); a non-folding topology
                # returns full-res logits and the adapter is skipped
                logits, updates = model.apply(variables, images, train=True,
                                              fold_logits=True,
                                              mutable=["batch_stats"])
                new_stats = updates["batch_stats"]
                if logits.shape[1] != masks.shape[1]:
                    logits, masks = fold_loss_layout(logits, masks)
            else:
                logits = model.apply(variables, images, train=False)
                new_stats = batch_stats
            preds = logits[..., 0] if regression else logits
            loss = loss_fn(preds, masks, sample_mask=sample_mask) if sample_mask is not None \
                else loss_fn(preds, masks)
            return loss, (preds, new_stats)

        accum = max(1, cfg.grad_accum)

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, images, masks, key):
            if not regression:
                # labels cross h2d in their storage width (uint8 typically —
                # data/dataset.py::load_pair) and widen for free on device
                masks = masks.astype(jnp.int32)
            images, masks = augment_batch(
                key, images, masks, aug_cfg,
                n_transform_imgs=cfg.n_transform_imgs, dtype_str=dtype_str,
                normalize=cfg.normalize, split="train", split_idx=cfg.split_idx,
                reference_quirks=cfg.reference_quirks,
            )
            if accum == 1:
                (loss, (_, new_stats)), grads = jax.value_and_grad(
                    forward_loss, has_aux=True
                )(state.params, state.batch_stats, images, masks, True)
            else:
                # sequential microbatches in one compiled step: activations
                # live per scan iteration, gradients sum in a params-sized
                # carry — grad of the pixel-mean loss decomposes exactly
                # into the mean of equal-sized microbatch grads; BN stats
                # evolve microbatch-to-microbatch (TrainerConfig.grad_accum)
                b = images.shape[0]
                mb_imgs = images.reshape(accum, b // accum, *images.shape[1:])
                mb_msks = masks.reshape(accum, b // accum, *masks.shape[1:])

                def body(carry, mb):
                    stats, gsum, lsum = carry
                    (l, (_, stats)), g = jax.value_and_grad(
                        forward_loss, has_aux=True
                    )(state.params, stats, mb[0], mb[1], True)
                    gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                    return (stats, gsum, lsum + l), None

                zeros = jax.tree_util.tree_map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
                (new_stats, gsum, lsum), _ = jax.lax.scan(
                    body, (state.batch_stats, zeros, jnp.float32(0)),
                    (mb_imgs, mb_msks))
                grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
                loss = lsum / accum
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                state.replace(step=state.step + 1, params=params,
                              batch_stats=new_stats, opt_state=new_opt),
                loss,
            )

        @jax.jit
        def eval_step(state: TrainState, images, masks, n_valid, key, metric_state):
            if not regression:
                masks = masks.astype(jnp.int32)  # see train_step
            sample_mask = jnp.arange(images.shape[0]) < n_valid
            # eval-time augmentation (split_idx=1/None) draws fresh
            # randomness per batch like the reference's batch_tfms; with the
            # default split_idx=0 this path only applies value scaling
            images, masks = augment_batch(
                key, images, masks, aug_cfg,
                n_transform_imgs=cfg.n_transform_imgs, dtype_str=dtype_str,
                normalize=cfg.normalize, split="valid", split_idx=cfg.split_idx,
                reference_quirks=cfg.reference_quirks,
            )
            loss, (preds, _) = forward_loss(
                state.params, state.batch_stats, images, masks, False, sample_mask
            )
            if regression:
                metric_state = M.regression_update(metric_state, preds, masks, sample_mask)
            else:
                metric_state = M.dice_multi_update(metric_state, preds, masks, sample_mask)
            return loss, metric_state

        return train_step, eval_step

    # --- validation ---------------------------------------------------------------

    def _metric_init(self):
        return (M.regression_init() if self.cfg.regression
                else M.dice_multi_init(self.n_out))

    def _metric_values(self, metric_state) -> Dict[str, float]:
        if self.cfg.regression:
            return {
                "rmse": float(M.rmse_value(metric_state)),
                "r2_score": float(M.r2_value(metric_state)),
            }
        return {"dice_multi": float(M.dice_multi_value(metric_state))}

    def evaluate(self, state: TrainState, eval_step) -> Dict[str, float]:
        metric_state = self._metric_init()
        losses: List[Any] = []
        counts: List[int] = []
        key = jax.random.PRNGKey(self.cfg.seed + 7)  # per-call eval stream
        for images, masks, n_valid in prefetch_to_mesh(self.valid_loader, self.mesh):
            key, sub = jax.random.split(key)
            loss, metric_state = eval_step(state, images, masks, n_valid, sub, metric_state)
            losses.append(loss)  # device scalar; fetched once below
            counts.append(n_valid)
        losses = [float(l) for l in jax.device_get(losses)]
        n_sum = sum(counts)
        out = {"valid_loss": sum(l * n for l, n in zip(losses, counts)) / max(n_sum, 1)}
        out.update(self._metric_values(metric_state))
        return out

    # --- fit -----------------------------------------------------------------------

    def fit(self, state: Optional[TrainState] = None) -> Tuple[TrainState, List[Dict[str, Any]]]:
        cfg = self.cfg
        lr = cfg.lr
        if cfg.lr_finder is not None:
            lr = self.lr_find(cfg.lr_finder)
            print(f"Optimized learning rate: {lr}")
        if state is None:
            state = self.init_state(lr=lr)
        train_step, eval_step = self._build_steps(self.tx)

        mgr = self._checkpoint_manager() if (cfg.checkpoint_every or cfg.resume) else None
        start_epoch = 0
        if cfg.resume and mgr is not None and mgr.latest_step() is not None:
            state, start_epoch = self._restore(mgr, state)
            print(f"Resumed from epoch {start_epoch}")

        key = jax.random.PRNGKey(cfg.seed + 1)
        best_metric, best_vars = None, None
        smooth_loss, smooth_count = 0.0, 0
        beta = 0.98  # fastai AvgSmoothLoss

        from ..utils.profiling import device_trace

        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.monotonic()
            trace_ctx = device_trace(cfg.profile_dir) if epoch == start_epoch else None
            if trace_ctx is not None:
                trace_ctx.__enter__()
            epoch_losses = []
            # double-buffered h2d: batch N+1's transfer rides alongside step
            # N's compute (prefetch_to_mesh); the h2d phase now measures only
            # the residual wait, ≈ max(0, transfer - step) per batch
            batches = iter(prefetch_to_mesh(self.train_loader, self.mesh))
            while True:
                with self.timer.phase("h2d"):
                    nxt = next(batches, None)
                if nxt is None:
                    break
                images, masks, _ = nxt
                key, sub = jax.random.split(key)
                with self.timer.phase("train_step"):
                    state, loss = train_step(state, images, masks, sub)
                    # keep the loss on device: fetching it here would force a
                    # host sync every step (the steps already serialize via
                    # the donated-state data dependency)
                    epoch_losses.append(loss)
            if trace_ctx is not None:
                trace_ctx.__exit__(None, None, None)
            with self.timer.phase("loss_fetch"):
                for loss in jax.device_get(epoch_losses):
                    loss = float(loss)
                    if math.isfinite(loss):
                        smooth_count += 1
                        smooth_loss = beta * smooth_loss + (1 - beta) * loss
            train_loss = smooth_loss / (1 - beta**max(smooth_count, 1))

            row: Dict[str, Any] = {"epoch": epoch, "train_loss": train_loss}
            with self.timer.phase("evaluate"):
                row.update(self.evaluate(state, eval_step))
            row["time"] = _fmt_time(time.monotonic() - t0)
            self.history.append(row)
            print("  ".join(f"{k}={v if isinstance(v, str) else round(v, 5)}"
                            for k, v in row.items()))

            current = row[self.monitor]
            if best_metric is None or self.comp(current, best_metric):
                best_metric = current
                best_vars = jax.tree_util.tree_map(
                    np.asarray, {"params": state.params, "batch_stats": state.batch_stats}
                )
            if mgr is not None and cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
                self._save(mgr, state, epoch + 1)

        if mgr is not None:
            mgr.wait_until_finished()
        # SaveModelCallback: restore the best epoch's weights at the end
        if best_vars is not None:
            state = state.replace(
                params=replicate_tree(self.mesh, best_vars["params"]),
                batch_stats=replicate_tree(self.mesh, best_vars["batch_stats"]),
            )
        self._best_vars = best_vars
        return state, self.history

    # --- lr finder -------------------------------------------------------------------

    def lr_find(self, method: str = "valley", num_it: int = 100,
                start_lr: float = 1e-7, end_lr: float = 10.0) -> float:
        """fastai lr_find: exponential sweep, stop on divergence, suggest."""
        variables = self.init_variables()
        ratio = end_lr / start_lr

        def lr_fn(step):
            pos = jnp.minimum(step, num_it - 1) / max(num_it - 1, 1)
            return start_lr * ratio**pos

        tx = constant_lr_adam(variables["params"], lr_fn)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables["batch_stats"], opt_state=tx.init(variables["params"]),
        )
        state = replicate_tree(self.mesh, state)
        train_step, _ = self._build_steps(tx)

        losses: List[float] = []
        lrs = lr_finder_lrs(start_lr, end_lr, num_it)
        key = jax.random.PRNGKey(self.cfg.seed + 2)
        it = 0
        best = np.inf
        window: List[Any] = []  # device scalars; fetched once per window
        WINDOW = 10  # a host sync per step costs ~25 ms through the axon
        # tunnel (BENCH_NOTES.md); batching fetches keeps the sweep async

        def drain() -> bool:
            """Fetch the window's losses at once; True if diverged."""
            nonlocal best, num_it
            vals = [float(v) for v in jax.device_get(window)]
            window.clear()
            for v in vals:
                losses.append(v if math.isfinite(v) else 1e9)
                best = min(best, losses[-1])
                if losses[-1] > 4 * best and len(losses) > 10:  # fastai stop
                    num_it = len(losses)
                    return True
            return False

        diverged = False
        while it < num_it and not diverged:
            for images, masks, _ in prefetch_to_mesh(self.train_loader, self.mesh):
                if it >= num_it:
                    break
                key, sub = jax.random.split(key)
                state, loss = train_step(state, images, masks, sub)
                window.append(loss)
                it += 1
                if len(window) >= WINDOW:
                    diverged = drain()
                    if diverged:
                        break
        if window and not diverged:
            drain()
        losses = losses[:num_it]
        self._lr_find_curve = (lrs[: len(losses)], losses)
        # all four suggesters (utils.py:150-167) so the persisted curve can
        # carry every marker, whichever one drives the run
        self._lr_find_suggestions = {
            m: suggest_lr(lrs[: len(losses)], losses, m)
            for m in ("minimum", "steep", "valley", "slide")
        }
        return suggest_lr(lrs[: len(losses)], losses, method)

    def save_lr_find(self, bundle_dir: Path) -> None:
        """Persist the last lr_find sweep next to the history CSV: a
        ``<desc>_lr_find.csv`` (lr,loss) and ``<desc>_lr_find.png`` with the
        four suggester markers (fastai renders this for free at
        utils.py:150-167; we write it explicitly)."""
        curve = getattr(self, "_lr_find_curve", None)
        if not curve:
            return
        lrs, losses = curve
        desc = self.cfg.description
        lines = ["lr,loss"] + [
            f"{float(lr)!r},{float(ls)!r}" for lr, ls in zip(lrs, losses)]
        (bundle_dir / f"{desc}_lr_find.csv").write_text("\n".join(lines) + "\n")
        from ..utils.plots import plot_lr_find

        plot_lr_find(lrs, losses, getattr(self, "_lr_find_suggestions", {}),
                     bundle_dir / f"{desc}_lr_find.png")

    # --- orbax resume ------------------------------------------------------------------

    def _ckpt_dir(self) -> Path:
        return Path(self.cfg.model_path) / self.cfg.description / "checkpoints"

    def _checkpoint_manager(self):
        import orbax.checkpoint as ocp

        d = self._ckpt_dir()
        d.mkdir(parents=True, exist_ok=True)
        return ocp.CheckpointManager(d.resolve(), options=ocp.CheckpointManagerOptions(max_to_keep=2))

    def _save(self, mgr, state: TrainState, epoch: int):
        import orbax.checkpoint as ocp

        host = jax.tree_util.tree_map(np.asarray, state)
        mgr.save(epoch, args=ocp.args.StandardSave(host))

    def _restore(self, mgr, template: TrainState) -> Tuple[TrainState, int]:
        import orbax.checkpoint as ocp

        step = mgr.latest_step()
        host_template = jax.tree_util.tree_map(np.asarray, template)
        restored = mgr.restore(step, args=ocp.args.StandardRestore(host_template))
        return replicate_tree(self.mesh, restored), int(step)

    # --- export ----------------------------------------------------------------------

    def manifest(self) -> Dict[str, Any]:
        """Run manifest ≈ the reference's description.json
        (utils.py:365-434) + everything needed to rebuild the model."""
        from ..data.dataset import get_patch_size

        width, resolution, data_type, bands = get_patch_size(self.data_path)
        cfg = self.cfg
        return {
            "transforms": bool(cfg.transforms),
            "patch_size": width,
            "resolution": list(resolution) if resolution else None,
            "data_type": data_type,
            "number_of_bands": bands,
            "aug_params_": self.aug_cfg.describe() if cfg.transforms else None,
            "BATCH_SIZE": cfg.batch_size,
            "EPOCHS": cfg.epochs,
            "enable_regression": cfg.regression,
            "LEARNING_RATE": cfg.lr,
            "LR_FINDER": cfg.lr_finder,
            "ENCODER_FACTOR": cfg.encoder_factor,
            "CLASS_WEIGHTS": cfg.class_weights if isinstance(cfg.class_weights, str)
            else list(cfg.class_weights),
            "loss_func": cfg.loss_func,
            "self_attention": cfg.self_attention,
            "monitor": self.monitor,
            "VALID_SCENES": list(cfg.valid_scenes),
            "ARCHITECTURE": cfg.arch,
            "CODES": list(cfg.codes),
            "n_transform_imgs": cfg.n_transform_imgs,
            "info": cfg.info,
            "class_zero": cfg.class_zero,
            # rebuild fields
            "n_out": self.n_out,
            "c_in": self.c_in,
            "tpu_opt": cfg.tpu_opt,
            "tpu_opt_topology": TPU_OPT_TOPOLOGY_VERSION if cfg.tpu_opt else None,
            "dtype_str": self.dtype_str,
            "normalize": cfg.normalize,
            "resolved_class_weights": list(self.class_weights),
        }

    def export(self, state: TrainState) -> Path:
        cfg = self.cfg
        bundle_dir = Path(cfg.model_path) / cfg.description
        variables = jax.tree_util.tree_map(
            np.asarray, {"params": state.params, "batch_stats": state.batch_stats}
        )
        ckpt.export_bundle(bundle_dir, cfg.description, variables, self.manifest())
        if getattr(self, "_best_vars", None) is not None:
            ckpt.save_weights(bundle_dir / "best-model.msgpack", self._best_vars)
        # CSVLogger-schema history (train.py:255-257 *_history.csv)
        if self.history:
            cols = list(self.history[0].keys())
            lines = [",".join(cols)] + [
                ",".join(str(r[c]) for c in cols) for r in self.history
            ]
            (bundle_dir / f"{cfg.description}_history.csv").write_text("\n".join(lines) + "\n")
        if self.timer.samples:
            (bundle_dir / f"{cfg.description}_profile.txt").write_text(self.timer.report() + "\n")
        self.save_lr_find(bundle_dir)
        return bundle_dir


def train_model(cfg: TrainerConfig) -> Path:
    """End-to-end: build trainer, fit, export bundle. Returns bundle dir.

    Orchestration mirror of train_func (train.py:287-373): dataset stats and
    class-weight prints, optional batch-histogram visualization and model
    summary, training, loss plot, bundle export.
    """
    trainer = Trainer(cfg)
    try:
        return _train_model(trainer, cfg)
    finally:
        trainer.close()


def _train_model(trainer: "Trainer", cfg: TrainerConfig) -> Path:
    print(f"Train files: {trainer.dataset.n_train}, Test files: {trainer.dataset.n_valid}")
    if not cfg.regression:
        print(f"Class weights: {trainer.class_weights}")

    bundle_dir = Path(cfg.model_path) / cfg.description
    bundle_dir.mkdir(parents=True, exist_ok=True)
    model_path = bundle_dir / f"{cfg.description}.msgpack"

    if cfg.visualize_data_example:
        from ..utils.plots import visualize_data

        images, masks, _ = trainer.train_loader.one_batch()
        print(f"Input shape: {images.shape}, Output shape: {masks.shape}")
        print(f"Examplary value range INPUT: {images.min()} to {images.max()}")
        visualize_data(images, model_path)
        visualize_data(masks, model_path)

    state, history = trainer.fit()
    out = trainer.export(state)

    if history:
        from ..utils.plots import plot_training_overview

        plot_training_overview(
            history, trainer.monitor, bundle_dir / f"{cfg.description}_history.png"
        )

    if cfg.export_model_summary:
        # learn.summary() equivalent (train.py:232-240): class weights +
        # layer table with shapes and parameter counts
        summary_path = out / f"{cfg.description}_model_summary.txt"
        per_module = {
            k: sum(x.size for x in jax.tree_util.tree_leaves(v))
            for k, v in state.params.items()
        }
        n_params = sum(per_module.values())
        lines = [f"Class_weights: {trainer.class_weights}",
                 f"Architecture: {cfg.arch}",
                 f"Input: {trainer.tile_hw} x {trainer.c_in} bands -> {trainer.n_out} outputs",
                 f"Total parameters: {n_params:,}", "", "Per-module parameters:"]
        lines += [f"  {k}: {v:,}" for k, v in sorted(per_module.items())]
        try:
            import flax.linen as nn

            x = jnp.zeros((1, *trainer.tile_hw, trainer.c_in), jnp.float32)
            table = nn.tabulate(
                trainer.model, jax.random.PRNGKey(0), depth=2,
                compute_flops=False, compute_vjp_flops=False,
            )(x, train=False)
            lines += ["", table]
        except Exception as e:  # tabulate is best-effort decoration
            lines += ["", f"(layer table unavailable: {e})"]
        summary_path.write_text("\n".join(lines) + "\n")
    return out
