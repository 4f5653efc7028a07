"""Checkpointing: params + optimizer state + step + lambda, with resume.

The reference's checkpointing is 4 bare weight files with no optimizer state
or step cursor in tf2_0 (tf2_0/src/training.py:167-172) and a full
tf.train.Saver + a side-car epoch file in tf1_13 (tf1_13/src/training.py:
156-172). Here one Orbax checkpoint carries the whole TrainState (so resume
is exact, Adam moments included), and ``export_params`` writes a deploy-only
params checkpoint (the tf1_13 "encoder/decoder only" Savers' role).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from neural_network_image_compression_tpu.training.train_step import TrainState


class CheckpointStore:
    def __init__(self, directory: str, max_to_keep: int = 2):
        # 2 = latest + one fallback: exact-resume safety without letting
        # superseded checkpoint shards accumulate in run directories (they
        # end up snapshotted into git history at round end).
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState, epoch: int) -> None:
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "rd_lambda": state.rd_lambda,
            "epoch": np.asarray(epoch, np.int32),
        }
        self._mgr.save(int(state.step), args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template_state: TrainState) -> tuple[TrainState, int] | None:
        """Restore the latest checkpoint into the template's structure.
        Returns (state, epoch) or None if no checkpoint exists."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        template = {
            "params": template_state.params,
            "opt_state": template_state.opt_state,
            "step": template_state.step,
            "rd_lambda": template_state.rd_lambda,
            "epoch": np.asarray(0, np.int32),
        }
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        payload = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        state = TrainState(
            params=payload["params"],
            opt_state=payload["opt_state"],
            step=payload["step"],
            rd_lambda=payload["rd_lambda"],
        )
        return state, int(payload["epoch"])

    def close(self) -> None:
        self._mgr.close()


def export_params(params: Any, directory: str) -> None:
    """Deploy-only export: just the model params (no optimizer state)."""
    path = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "params"), params)
    ckptr.wait_until_finished()


def load_params(template_params: Any, directory: str) -> Any:
    path = os.path.join(os.path.abspath(directory), "params")
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template_params)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, abstract)


def load_run_params(run_dir: str):
    """Latest checkpoint params of another training run (its own config)."""
    import jax

    from neural_network_image_compression_tpu.config import Config
    from neural_network_image_compression_tpu.models.codec import NeuralCodec
    from neural_network_image_compression_tpu.training.train_step import (
        init_train_state,
    )

    with open(os.path.join(run_dir, "config.json")) as f:
        cfg = Config.from_json(f.read())
    codec = NeuralCodec(cfg)
    store = CheckpointStore(os.path.join(run_dir, "checkpoints"))
    template = init_train_state(codec, jax.random.key(0), cfg)
    restored = store.restore(template)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {run_dir}/checkpoints")
    state, _ = restored
    return jax.device_get(state.params)


def warm_start(params, donor_run_dir: str):
    """Copy param groups that exist in both trees from another run's latest
    checkpoint (matching subtree structure AND leaf shapes/dtypes required);
    leave the rest (e.g. freshly-added context nets) at their init.

    Groups whose structure matches but whose leaf shapes or dtypes differ
    (donor trained with another preset/width) are skipped with a report
    instead of copied — a silent copy would only blow up later deep inside
    tx.update/jit with a confusing error far from the cause."""
    donor = load_run_params(donor_run_dir)
    out = dict(params)
    copied, skipped = [], []
    for k in params:
        if k not in donor:
            continue
        a = jax.tree_util.tree_structure(params[k])
        b = jax.tree_util.tree_structure(donor[k])
        if a != b:
            skipped.append((k, "tree structure differs"))
            continue
        mismatch = None
        for la, lb in zip(
            jax.tree_util.tree_leaves(params[k]),
            jax.tree_util.tree_leaves(donor[k]),
        ):
            if np.shape(la) != np.shape(lb) or np.asarray(la).dtype != np.asarray(lb).dtype:
                mismatch = f"leaf {np.shape(lb)}/{np.asarray(lb).dtype} vs expected {np.shape(la)}/{np.asarray(la).dtype}"
                break
        if mismatch is not None:
            skipped.append((k, mismatch))
            continue
        out[k] = donor[k]
        copied.append(k)
    if skipped:
        print(f"warm_start: skipped {skipped} from {donor_run_dir}")
    if not copied:
        raise ValueError(
            f"no compatible param groups with {donor_run_dir} (skipped: {skipped})"
        )
    return out, copied
