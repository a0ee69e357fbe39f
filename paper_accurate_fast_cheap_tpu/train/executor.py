"""Training executor: epoch loop, CV, snapshots, metrics.

Parity target: `wenet/utils/executor.py` — epoch train loop (`:51-269`):
per-step forward/backward/update, log every log_interval, mid-epoch CV +
snapshot every save_interval steps (optimizer included every
save_optimizer_every-th), forced-snapshot flag file, frames-seen accounting;
`cv` (`:271-318`).

TPU-native: the step (featurize -> loss -> grads -> update) is one jitted
function; the reference's DDP join/no_sync/monitored_barrier machinery is
unnecessary because SPMD jit has no uneven-input hang mode (all ranks run the
same program; data sharding pads the final batch instead).
"""
from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.train import checkpointing

log = logging.getLogger(__name__)


class Executor:
    def __init__(
        self,
        train_step: Callable,     # (state, batch, rng) -> (state, loss, metrics)
        eval_loss: Callable,      # (params, batch) -> (loss, metrics)
        featurize: Callable,      # (wavs, wav_lens, rng, train) -> feats
        model_dir: str = None,
        log_interval: int = 100,
        save_interval: int = 0,
        save_optimizer_every: int = 10,
        use_named_snapshots: bool = False,
        seed: int = 0,
        metrics_logger=None,
    ):
        self.train_step = train_step
        self.eval_loss = eval_loss
        self.featurize = featurize
        self.model_dir = model_dir
        self.log_interval = log_interval
        self.save_interval = save_interval
        self.save_optimizer_every = save_optimizer_every
        self.use_named_snapshots = use_named_snapshots
        self.metrics_logger = metrics_logger
        self.step = 0
        self.frames_seen = 0
        self.snapshots_saved = 0
        self.rng = jax.random.PRNGKey(seed)

    def _prepare(self, batch: Dict[str, np.ndarray], train: bool):
        self.rng, k = jax.random.split(self.rng)
        feats, feat_lens = self.featurize(
            jnp.asarray(batch["wavs"]), jnp.asarray(batch["wav_lens"]),
            rng=k, train=train,
        )
        out = (feats, feat_lens, jnp.asarray(batch["labels"]),
               jnp.asarray(batch["label_lens"]))
        if "cat_embs" in batch:
            # LSL conditioning vector (`rev_processor.py pass_one_hot` ->
            # LanguageSpecificConformerEncoderLayer)
            out = out + (jnp.asarray(batch["cat_embs"]),)
        return out

    def train_epoch(
        self,
        state,
        batches: Iterable[Dict[str, np.ndarray]],
        epoch: int = 0,
        cv_batches: Optional[Callable] = None,
        lr_of_step: Optional[Callable] = None,
    ):
        t0 = time.time()
        for batch_idx, raw in enumerate(batches):
            dev_batch = self._prepare(raw, train=True)
            self.rng, k = jax.random.split(self.rng)
            state, loss, metrics = self.train_step(state, dev_batch, k)
            self.step += 1
            self.frames_seen += int(np.sum(raw["wav_lens"])) // 160
            if batch_idx % self.log_interval == 0:
                lr = float(lr_of_step(self.step)) if lr_of_step else None
                if self.metrics_logger is not None:
                    self.metrics_logger.log(
                        self.step,
                        dict({k2: float(v) for k2, v in metrics.items()},
                             loss=float(loss),
                             frames_seen=self.frames_seen,
                             **({"lr": lr} if lr is not None else {})),
                    )
                parts = " ".join(
                    f"{k2}={float(v):.4f}" for k2, v in metrics.items()
                )
                log.info(
                    "epoch %d batch %d step %d loss %.4f %s lr %s "
                    "(%.1f s)", epoch, batch_idx, self.step, float(loss),
                    parts, f"{lr:.2e}" if lr else "-", time.time() - t0,
                )
            if (
                self.save_interval > 0
                and self.step % self.save_interval == 0
                and self.model_dir
            ):
                self._mid_epoch_snapshot(state, epoch, cv_batches)
        return state

    def _mid_epoch_snapshot(self, state, epoch, cv_batches):
        info = {
            "epoch": epoch, "step": self.step,
            "frames_seen": self.frames_seen, "tag": "snapshot",
        }
        if cv_batches is not None:
            cv_loss = self.cv(state.params, cv_batches())
            info["cv_loss"] = float(cv_loss)
            log.info("step %d cv_loss %.4f", self.step, cv_loss)
            if self.metrics_logger is not None:
                self.metrics_logger.log(self.step, {"loss": cv_loss},
                                        prefix="cv")
        self.snapshots_saved += 1
        forced = self.model_dir and checkpointing.\
            check_forced_full_snapshot_flag(self.model_dir)
        with_opt = forced or (
            self.snapshots_saved % self.save_optimizer_every == 0
        )
        path = checkpointing.snapshot_name(
            self.model_dir, step=self.step, with_optimizer=with_opt,
            use_named=self.use_named_snapshots,
        )
        checkpointing.save_checkpoint(
            path, state.params, state.opt_state if with_opt else None, info
        )
        if self.metrics_logger is not None:
            self.metrics_logger.log_checkpoint(path, metadata=info,
                                               with_optimizer=with_opt)

    def cv(self, params, batches: Iterable[Dict[str, np.ndarray]]):
        total, count = 0.0, 0
        for raw in batches:
            dev_batch = self._prepare(raw, train=False)
            loss, _ = self.eval_loss(params, dev_batch)
            bs = len(raw["keys"])
            total += float(loss) * bs
            count += bs
        return total / max(count, 1)

    def save_epoch(self, state, epoch: int, cv_loss: float = None):
        if not self.model_dir:
            return
        info = {"epoch": epoch, "step": self.step,
                "frames_seen": self.frames_seen, "tag": f"epoch_{epoch}"}
        if cv_loss is not None:
            info["cv_loss"] = float(cv_loss)
        path = checkpointing.snapshot_name(self.model_dir, epoch=epoch)
        checkpointing.save_checkpoint(path, state.params, state.opt_state,
                                      info)
