"""Orbax checkpoint management with auto-resume.

Parity with the reference trainer's behavior (train_itg.py:1388-1397 +
finetune-qwen2-7b-grounding.sh:43-45): periodic checkpoints with a keep
limit, automatic resume from the newest checkpoint in output_dir, and a
final full save. Sharded arrays save/restore with their shardings (the
orbax equivalent of ZeRO's gather-on-save, without the gather).
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp


class TrainCheckpointer:
    def __init__(self, output_dir: str, max_to_keep: int = 2,
                 save_interval: int = 500, async_save: bool = False):
        self.directory = os.path.abspath(os.path.join(output_dir, "checkpoints"))
        os.makedirs(self.directory, exist_ok=True)
        self.save_interval = save_interval
        # async_save=True lets orbax serialize in background threads while
        # training continues (worth it on real pods where the device->host
        # snapshot is PCIe-fast and only the disk write overlaps). It is
        # OPT-IN because async periodic saves are not durable at return: a
        # kill before background finalization silently loses the newest
        # checkpoint, and a separately-opened manager does not see it —
        # semantics the kill+resume flow must opt into knowingly. Forced
        # (final) saves always block either way.
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=async_save,
            ),
        )

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def maybe_save(self, step: int, state, force: bool = False) -> bool:
        if not force and (self.save_interval <= 0 or step % self.save_interval != 0):
            return False
        self.manager.save(step, args=ocp.args.StandardSave(state))
        if force:
            self.manager.wait_until_finished()
        return True

    def restore_latest(self, template):
        """Restore the newest checkpoint into the template's structure
        (shardings are taken from the template's arrays)."""
        step = self.latest_step()
        if step is None:
            return None, None
        restored = self.manager.restore(step, args=ocp.args.StandardRestore(template))
        return step, restored

    def close(self):
        self.manager.close()
