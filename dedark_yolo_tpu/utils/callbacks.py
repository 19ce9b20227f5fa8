"""Callback bus: the 27 lifecycle hook points of the reference
(ultralytics/utils/callbacks/base.py:146-212), plus built-in CSV/TensorBoard-style
integrations kept optional. Handlers receive the Trainer/Validator/Predictor."""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

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

    for register in _TRACKERS:
        try:
            register(callbacks)
        except Exception:   # tracker not installed / import-time failure
            pass
    return callbacks


def _clean_metrics(trainer):
    out = {}
    for k, v in (trainer.metrics or {}).items():
        try:
            out[k.replace("(", "").replace(")", "")] = float(v)
        except (TypeError, ValueError):
            pass
    return out


def _register_wandb(callbacks):
    """Weights & Biases (reference callbacks/wb.py pattern: init run on
    pretrain start, log per fit-epoch, finish on train end)."""
    import wandb

    def start(trainer):
        if wandb.run is None:
            wandb.init(project=str(getattr(trainer.args, "project", None)
                                   or "dedark-yolo-tpu"),
                       name=str(getattr(trainer.args, "name", None) or None),
                       config=dict(vars(trainer.args)))

    def epoch_end(trainer):
        if wandb.run:
            wandb.log(_clean_metrics(trainer), step=trainer.epoch + 1)

    def end(trainer):
        if wandb.run:
            wandb.finish()

    callbacks["on_pretrain_routine_start"].append(start)
    callbacks["on_fit_epoch_end"].append(epoch_end)
    callbacks["on_train_end"].append(end)


def _register_mlflow(callbacks):
    """MLflow (reference callbacks/mlflow.py pattern)."""
    import mlflow

    def start(trainer):
        mlflow.start_run(run_name=str(getattr(trainer.args, "name", None)
                                      or "train"))
        mlflow.log_params({k: str(v) for k, v in vars(trainer.args).items()})

    def epoch_end(trainer):
        mlflow.log_metrics(_clean_metrics(trainer), step=trainer.epoch + 1)

    def end(trainer):
        mlflow.end_run()

    callbacks["on_pretrain_routine_start"].append(start)
    callbacks["on_fit_epoch_end"].append(epoch_end)
    callbacks["on_train_end"].append(end)


def _register_clearml(callbacks):
    """ClearML (reference callbacks/clearml.py pattern)."""
    from clearml import Task

    state = {}

    def start(trainer):
        state["task"] = Task.init(
            project_name=str(getattr(trainer.args, "project", None)
                             or "dedark-yolo-tpu"),
            task_name=str(getattr(trainer.args, "name", None) or "train"))
        state["task"].connect(dict(vars(trainer.args)))

    def epoch_end(trainer):
        t = state.get("task")
        if t:
            for k, v in _clean_metrics(trainer).items():
                t.get_logger().report_scalar("train", k, v, trainer.epoch + 1)

    def end(trainer):
        t = state.pop("task", None)
        if t:
            t.close()

    callbacks["on_pretrain_routine_start"].append(start)
    callbacks["on_fit_epoch_end"].append(epoch_end)
    callbacks["on_train_end"].append(end)


def _register_dvclive(callbacks):
    """DVCLive (reference callbacks/dvc.py pattern)."""
    import dvclive

    state = {}

    def start(trainer):
        state["live"] = dvclive.Live(str(trainer.save_dir / "dvc"),
                                     save_dvc_exp=False)

    def epoch_end(trainer):
        live = state.get("live")
        if live:
            for k, v in _clean_metrics(trainer).items():
                live.log_metric(k, v)
            live.next_step()

    def end(trainer):
        live = state.pop("live", None)
        if live:
            live.end()

    callbacks["on_pretrain_routine_start"].append(start)
    callbacks["on_fit_epoch_end"].append(epoch_end)
    callbacks["on_train_end"].append(end)


def _register_comet(callbacks):
    """Comet ML (reference callbacks/comet.py: experiment on pretrain start,
    log_metrics per fit-epoch, log_model + end on train end)."""
    import comet_ml
    assert hasattr(comet_ml, "__version__")  # not a bare directory

    state = {}

    def start(trainer):
        exp = comet_ml.Experiment(
            project_name=str(getattr(trainer.args, "project", None)
                             or "dedark-yolo-tpu"))
        exp.log_parameters({k: "" if v is None else v
                            for k, v in vars(trainer.args).items()})
        state["exp"] = exp

    def epoch_end(trainer):
        exp = state.get("exp")
        if exp:
            exp.log_metrics(_clean_metrics(trainer), step=trainer.epoch + 1,
                            epoch=trainer.epoch + 1)

    def end(trainer):
        exp = state.pop("exp", None)
        if exp:
            best = getattr(trainer, "best", None)
            if best is not None and Path(str(best)).exists():
                exp.log_model("best", str(best))
            exp.end()

    callbacks["on_pretrain_routine_start"].append(start)
    callbacks["on_fit_epoch_end"].append(epoch_end)
    callbacks["on_train_end"].append(end)


def _register_neptune(callbacks):
    """Neptune.ai (reference callbacks/neptune.py: init_run on pretrain start
    with the hyperparameter namespace, per-key scalar append per fit-epoch,
    stop on train end)."""
    import neptune
    assert hasattr(neptune, "__version__")

    state = {}

    def start(trainer):
        run = neptune.init_run(
            project=str(getattr(trainer.args, "project", None)
                        or "dedark-yolo-tpu"),
            name=str(getattr(trainer.args, "name", None) or "train"))
        run["Configuration/Hyperparameters"] = {
            k: "" if v is None else v for k, v in vars(trainer.args).items()}
        state["run"] = run

    def epoch_end(trainer):
        run = state.get("run")
        if run:
            for k, v in _clean_metrics(trainer).items():
                run[k].append(value=v, step=trainer.epoch + 1)

    def end(trainer):
        run = state.pop("run", None)
        if run:
            run.stop()

    callbacks["on_pretrain_routine_start"].append(start)
    callbacks["on_fit_epoch_end"].append(epoch_end)
    callbacks["on_train_end"].append(end)


def _register_raytune(callbacks):
    """Ray Tune (reference callbacks/raytune.py: session.report of the metric
    dict + epoch at each fit-epoch end, only when inside a tune session)."""
    import ray
    from ray import tune  # noqa: F401  (presence check, like the reference)
    from ray.air import session

    def epoch_end(trainer):
        if ray.tune.is_session_enabled():
            metrics = _clean_metrics(trainer)
            metrics["epoch"] = trainer.epoch
            session.report(metrics)

    callbacks["on_fit_epoch_end"].append(epoch_end)


# import-guarded tracker registrars, appended in reference order
# (callbacks/base.py:191-212); each silently skips when its client package is
# absent, exactly like the reference's try/except ImportError modules
_TRACKERS = (_register_wandb, _register_mlflow, _register_clearml,
             _register_dvclive, _register_comet, _register_neptune,
             _register_raytune)
