"""Checkpoint save/restore.

The reference persists ``{epoch, model_state_dict, optimizer_state_dict,
loss_train, loss_val[, scheduler_state_dict]}`` via torch.save
(/root/reference/lib/Trainer.py:145-157), with three artifact roles:
``Model_best`` (new best val loss), ``Model_after_{N}_epochs`` (periodic),
``Model_last`` (final). This module keeps the same roles and payload in a
pickle-free container: a single ``.npz`` holding every pytree leaf under its
key-path, plus a JSON metadata blob. Reference ``.pth`` files are importable
through ``models.torch_import`` (weights + BN state; see
``Trainer.load_pretrained``).
"""

from __future__ import annotations

import io
import json
import os as _os

import jax
import numpy as np

_META_KEY = "__meta__"


def _flatten_with_paths(tree) -> dict:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def save_checkpoint(path: str, *, epoch: int, params, bn_state, opt_state=None,
                    raw_params=None,
                    lr: float | None = None, loss_train=None, loss_val=None,
                    scheduler_state: dict | None = None, extra: dict | None = None):
    """Write a checkpoint .npz (atomically via an in-memory buffer).

    ``params`` is always the tree every consumer serves (test.py, the .pth
    exporter, warm starts). Under a weight EMA (training_settings.ema_decay)
    the Trainer passes the EMA there and the raw optimizer iterate as
    ``raw_params``, so serving "just works" while exact resume keeps the
    true training trajectory."""
    arrays = {}
    for name, tree in (("params", params), ("bn_state", bn_state),
                       ("opt_state", opt_state), ("raw_params", raw_params)):
        if tree is not None:
            for key, leaf in _flatten_with_paths(tree).items():
                arrays[f"{name}{key}"] = leaf
    meta = {
        "epoch": int(epoch),
        "lr": None if lr is None else float(lr),
        "loss_train": None if loss_train is None else float(loss_train),
        "loss_val": None if loss_val is None else float(loss_val),
        "scheduler_state": scheduler_state,
        "format_version": 1,
    }
    if extra:
        meta.update(extra)
    arrays[_META_KEY] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)

    buffer = io.BytesIO()
    np.savez(buffer, **arrays)
    # Write-to-temp + atomic rename: a crash mid-write never truncates an
    # existing good checkpoint (matters doubly for the async writer).
    tmp_path = f"{path}.tmp"
    with open(tmp_path, "wb") as f:
        f.write(buffer.getvalue())
    _os.replace(tmp_path, path)


def load_meta(path: str) -> dict:
    """Read ONLY a checkpoint's metadata.

    ``np.load`` on an .npz is lazy, so this touches just the ~100-byte
    ``__meta__`` member — resume bookkeeping must not decompress a
    multi-hundred-MB weights+moments archive to learn its epoch/loss.
    """
    with np.load(path) as blob:
        return json.loads(bytes(blob[_META_KEY].tobytes()).decode())


def load_checkpoint(path: str, *, params_template=None, bn_template=None,
                    opt_template=None, raw_template=None):
    """Load a checkpoint; pytrees are restored into the given templates.

    Returns ``(meta, params, bn_state, opt_state[, raw_params])`` — the
    4-tuple unless ``raw_template`` is given (EMA checkpoints store the raw
    optimizer iterate separately; ``raw_params`` is None when the file has
    none). Tree entries are None when no template is supplied for them.
    """
    with np.load(path) as blob:
        meta = json.loads(bytes(blob[_META_KEY].tobytes()).decode())
        stored = {k: blob[k] for k in blob.files if k != _META_KEY}

    def restore(name, template, optional=False):
        if template is None:
            return None
        if optional and not any(k.startswith(name) for k in stored):
            return None
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for leaf_path, leaf in flat:
            key = f"{name}{jax.tree_util.keystr(leaf_path)}"
            if key not in stored:
                raise KeyError(f"Checkpoint {path!r} is missing leaf {key!r}")
            value = stored[key]
            if value.shape != np.shape(leaf):
                raise ValueError(f"Checkpoint leaf {key!r} has shape {value.shape}, "
                                 f"expected {np.shape(leaf)}")
            leaves.append(value)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    base = (meta, restore("params", params_template),
            restore("bn_state", bn_template), restore("opt_state", opt_template))
    if raw_template is None:
        return base
    return base + (restore("raw_params", raw_template, optional=True),)


class AsyncCheckpointer:
    """Overlap checkpoint persistence with training.

    ``save()`` snapshots the pytrees with a device-side copy (cheap; ordered
    before any later donation of the live buffers on the single compute
    stream) and hands fetch + file write to a background thread, so the train
    loop never stalls on the device->host transfer (which dominates on
    remote/tunneled devices). Saves to any path serialize through one worker;
    ``wait()`` joins the in-flight save and re-raises its error, if any.
    """

    def __init__(self):
        self._thread = None
        self._error = None

    def save(self, path: str, *, epoch: int, params, bn_state, opt_state=None,
             raw_params=None, **meta) -> None:
        import threading

        import jax.numpy as jnp

        self.wait()
        snap_params, snap_bn, snap_opt, snap_raw = jax.tree_util.tree_map(
            jnp.copy, (params, bn_state, opt_state, raw_params))

        def work():
            try:
                save_checkpoint(path, epoch=epoch, params=snap_params,
                                bn_state=snap_bn, opt_state=snap_opt,
                                raw_params=snap_raw, **meta)
            except Exception as exc:  # surfaced on the next wait()/save()
                self._error = exc

        # Non-daemon: interpreter exit joins the writer instead of killing
        # it mid-write (save_checkpoint itself is atomic via temp+rename).
        self._thread = threading.Thread(target=work, daemon=False,
                                        name="ckpt-writer")
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            error, self._error = self._error, None
            raise error
