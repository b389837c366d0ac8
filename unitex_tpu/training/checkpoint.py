"""Checkpoint management: periodic saves, latest-resume, total-limit pruning.

Orbax-backed equivalent of the reference trainer's checkpoint flow
(/root/reference/flux_piplines/texturing/trainer.py:421-452 resume-latest,
:1139-1164 cadence + ``checkpoints_total_limit`` pruning): checkpoints live
in ``<dir>/checkpoint-<step>`` and the newest ones win.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, List, Optional


def _step_dirs(root: str) -> List[int]:
    if not os.path.isdir(root):
        return []
    steps = []
    for name in os.listdir(root):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


class CheckpointManager:
    def __init__(
        self,
        root: str,
        save_every: int = 500,
        total_limit: Optional[int] = None,
    ):
        self.root = root
        self.save_every = save_every
        self.total_limit = total_limit
        os.makedirs(root, exist_ok=True)

    def latest_step(self) -> Optional[int]:
        steps = _step_dirs(self.root)
        return steps[-1] if steps else None

    def path(self, step: int) -> str:
        return os.path.join(self.root, f"checkpoint-{step}")

    def should_save(self, step: int) -> bool:
        return step > 0 and step % self.save_every == 0

    def save(self, step: int, tree: Any) -> str:
        import jax
        import orbax.checkpoint as ocp

        path = os.path.abspath(self.path(step))
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.tree.map(lambda x: x, tree))
        ckptr.wait_until_finished()
        self._prune()
        return path

    def restore_latest(self, template: Any) -> Optional[Any]:
        """Restore the newest checkpoint into the template's structure, or
        None when the directory is empty (resume_from_checkpoint='latest')."""
        step = self.latest_step()
        if step is None:
            return None
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(self.path(step)), template)

    def _prune(self) -> None:
        if self.total_limit is None:
            return
        steps = _step_dirs(self.root)
        while len(steps) > self.total_limit:
            victim = steps.pop(0)
            shutil.rmtree(self.path(victim), ignore_errors=True)
