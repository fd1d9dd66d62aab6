"""Checkpoint store with the reference's manifest semantics, on orbax.

Equivalent of `torchplus/train/checkpoint.py`: a JSON manifest
(`checkpoints.json`) tracking latest + all checkpoints per model name,
step-suffixed directories, max_to_keep GC, restore-latest, and crash-safe
resume (`train.py:212,305,434-438`). State is an arbitrary pytree
(train state + step), serialized via orbax PyTreeCheckpointer.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


_MANIFEST = "checkpoints.json"


class CheckpointManager:
    def __init__(self, model_dir, name: str = "model", max_to_keep: int = 8):
        self._dir = pathlib.Path(model_dir)
        self._dir.mkdir(parents=True, exist_ok=True)
        self._name = name
        self._max_to_keep = max_to_keep
        self._ckpt = ocp.PyTreeCheckpointer()

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self) -> pathlib.Path:
        return self._dir / _MANIFEST

    def _read_manifest(self) -> dict:
        path = self._manifest_path()
        if path.exists():
            with open(path) as f:
                return json.load(f)
        return {"latest": {}, "all": {}}

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path().with_suffix(".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        tmp.replace(self._manifest_path())

    # -- save / restore ----------------------------------------------------
    def save(self, state: Any, step: int) -> pathlib.Path:
        ckpt_name = f"{self._name}-{step}"
        path = (self._dir / ckpt_name).resolve()
        state_np = jax.tree.map(np.asarray, state)
        self._ckpt.save(path, state_np, force=True)
        manifest = self._read_manifest()
        manifest["latest"][self._name] = ckpt_name
        entries = manifest["all"].setdefault(self._name, [])
        if ckpt_name not in entries:
            entries.append(ckpt_name)
        # GC oldest beyond max_to_keep (keep-latest policy)
        while len(entries) > self._max_to_keep:
            victim = entries.pop(0)
            victim_path = self._dir / victim
            if victim_path.exists():
                import shutil
                shutil.rmtree(victim_path)
        self._write_manifest(manifest)
        return path

    def latest_step(self) -> Optional[int]:
        manifest = self._read_manifest()
        latest = manifest["latest"].get(self._name)
        if latest is None:
            return None
        return int(latest.rsplit("-", 1)[1])

    def all_steps(self) -> list:
        """All retained checkpoint steps, oldest→newest (manifest 'all')."""
        manifest = self._read_manifest()
        return [int(name.rsplit("-", 1)[1])
                for name in manifest["all"].get(self._name, [])]

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `target` (a template pytree)."""
        if step is None:
            step = self.latest_step()
            if step is None:
                return None
        path = (self._dir / f"{self._name}-{step}").resolve()
        template = jax.tree.map(np.asarray, target)
        restored = self._ckpt.restore(path, item=template)
        return jax.tree.map(
            lambda t, r: jax.numpy.asarray(r) if hasattr(t, "dtype") else r,
            target, restored)

    def restore_raw(self, step: Optional[int] = None) -> Optional[Any]:
        """Restore the latest checkpoint WITHOUT a template — returns the
        raw nested dict (numpy leaves). Lets a different training program
        graft a sub-tree (e.g. joint fine-tune consuming a detector-only
        checkpoint) without reconstructing the saved TrainState/optimizer."""
        if step is None:
            step = self.latest_step()
            if step is None:
                return None
        path = (self._dir / f"{self._name}-{step}").resolve()
        return self._ckpt.restore(path)

    def try_restore_latest(self, target: Any) -> Any:
        """Restore-latest-or-None (reference try_restore_latest_checkpoints)."""
        try:
            return self.restore(target)
        except FileNotFoundError:
            return None
