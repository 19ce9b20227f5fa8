"""Callback bus: the 27 lifecycle hook points of the reference
(ultralytics/utils/callbacks/base.py:146-212), plus built-in CSV/TensorBoard-style
integrations kept optional. Handlers receive the Trainer/Validator/Predictor."""

from __future__ import annotations

from collections import defaultdict

HOOKS = [
    # trainer
    "on_pretrain_routine_start", "on_pretrain_routine_end", "on_train_start",
    "on_train_epoch_start", "on_train_batch_start", "optimizer_step",
    "on_before_zero_grad", "on_train_batch_end", "on_train_epoch_end",
    "on_fit_epoch_end", "on_model_save", "on_train_end", "on_params_update",
    "teardown",
    # validator
    "on_val_start", "on_val_batch_start", "on_val_batch_end", "on_val_end",
    # predictor
    "on_predict_start", "on_predict_batch_start", "on_predict_postprocess_end",
    "on_predict_batch_end", "on_predict_end",
    # exporter
    "on_export_start", "on_export_end",
]


def get_default_callbacks():
    return defaultdict(list, {h: [] for h in HOOKS})


def add_integration_callbacks(instance):
    """Attach optional experiment-tracker integrations if importable.

    The reference auto-appends 9 integrations (callbacks/base.py:191-212).
    Here: a JSONL metrics stream (always available, machine-readable
    observability) + TensorBoard when the package exists; the other trackers
    (wandb/mlflow/clearml/comet/dvc/neptune) are cloud services whose clients
    are not installable offline — they would follow the same pattern: import
    guard + hook registration.
    """
    callbacks = instance.callbacks

    # JSONL metrics stream: one line per epoch under save_dir/metrics.jsonl
    def jsonl_fit_epoch_end(trainer):
        import json
        import time as _t
        rec = {"epoch": trainer.epoch, "ts": _t.time()}
        for k, v in (trainer.metrics or {}).items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                pass
        try:
            with open(trainer.save_dir / "metrics.jsonl", "a") as f:
                f.write(json.dumps(rec) + "\n")
        except OSError:
            pass

    callbacks["on_fit_epoch_end"].append(jsonl_fit_epoch_end)

    try:
        from torch.utils.tensorboard import SummaryWriter  # torch cpu is baked in

        state = {}

        def on_train_start(trainer):
            # gated like the run plots (reference gates via SETTINGS['tensorboard'])
            if getattr(trainer.args, "plots", False):
                state["writer"] = SummaryWriter(
                    log_dir=str(trainer.save_dir / "tb"))

        def on_fit_epoch_end(trainer):
            w = state.get("writer")
            if w:
                for k, v in (trainer.metrics or {}).items():
                    try:
                        w.add_scalar(k, float(v), trainer.epoch)
                    except (TypeError, ValueError):
                        pass

        def on_train_end(trainer):
            w = state.pop("writer", None)
            if w:
                w.close()

        callbacks["on_train_start"].append(on_train_start)
        callbacks["on_fit_epoch_end"].append(on_fit_epoch_end)
        callbacks["on_train_end"].append(on_train_end)
    except Exception:
        pass
    return callbacks
