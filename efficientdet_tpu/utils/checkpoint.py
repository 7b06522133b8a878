"""Checkpoint save/restore via orbax (reference ModelCheckpoint + --snapshot).

The reference wrote whole-model ``.h5`` snapshots per epoch and resumed with
``--snapshot`` (SURVEY.md SS5 "Checkpoint / resume"). Here a checkpoint is
the full ``TrainState`` (params + batch_stats + opt_state + step), written
with orbax's StandardCheckpointer; ``keep`` limits retained snapshots and
``best_only`` mirrors the reference's save-best-mAP-only flag.
"""

from __future__ import annotations

import os
from typing import Any, Optional


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3, best_only: bool = False):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                best_fn=(lambda m: m.get("mAP", 0.0)) if best_only else None,
                best_mode="max",
            ),
        )

    def save(self, step: int, state: Any, metrics: Optional[dict] = None) -> None:
        import orbax.checkpoint as ocp

        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics or None
        )
        self._mgr.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        try:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(state_template)
            )
        except Exception as e:
            # Back-compat: snapshots written before TrainState grew the
            # lr_scale leaf have no such subtree; orbax rejects a template
            # with an extra leaf. Retry with a plain-dict template that
            # omits it, then backfill the template's value (1.0 = no
            # plateau decay yet). Only THAT mismatch retries — an
            # unrelated restore failure (corrupt snapshot, wrong model
            # size) must surface its own error, not a confusing
            # second-attempt one (round-3 review finding).
            import dataclasses

            lr = getattr(state_template, "lr_scale", None)
            if (
                lr is None
                or not dataclasses.is_dataclass(state_template)
                or "lr_scale" not in str(e)
            ):
                raise
            slim = {
                f.name: getattr(state_template, f.name)
                for f in dataclasses.fields(state_template)
                if f.name != "lr_scale"
                and getattr(state_template, f.name) is not None
            }
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(slim)
            )
            return state_template.replace(**restored, lr_scale=lr)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_partial(
        self, sub_template: Any, step: Optional[int] = None
    ) -> Any:
        """Restore a SUBTREE of a saved TrainState (e.g. params +
        batch_stats for inference) without reconstructing the optimizer
        template the full snapshot carries."""
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        return ckptr.restore(
            os.path.join(self.directory, str(step), "default"),
            args=ocp.args.PyTreeRestore(
                item=sub_template, partial_restore=True
            ),
        )


def save_params(path: str, params: Any) -> None:
    """One-shot params-only save (reference's prediction-weights .h5)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def load_params(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=template)
