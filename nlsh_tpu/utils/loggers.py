"""Experiment loggers behind one duck-typed interface.

Parity with the reference ``nlsh/loggers.py``: ``NullLogger``,
``TensorboardX``, ``CometML``, ``WandB`` exposing
``meta(params) / log(name, value, step) / args(text) / run_name``
(``loggers.py:6-97``).  New here: :class:`JSONLLogger`, a
dependency-free structured log (one JSON object per metric) that the
benchmark harness and tests read back.  Third-party backends import
lazily and raise a clear error when the SDK is absent.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class NullLogger:
    """Print-only logger, throttled to every 100 steps for scalar spam
    (reference ``loggers.py:6-24``)."""

    def __init__(self, every: int = 100):
        self._every = every

    @property
    def run_name(self) -> str:
        return "Null"

    def meta(self, params=None, **kwargs):
        if params:
            print(params)
        if kwargs:
            print(kwargs)

    def log(self, name, value, step):
        if step % self._every == 0:
            print(f"Step {step} {name}: {value}")

    def args(self, arg_text):
        print(arg_text)


class JSONLLogger:
    """Structured metrics to a .jsonl file — no external SDK needed."""

    def __init__(self, path: str, run_name: str | None = None, echo: bool = False):
        self._path = Path(path)
        self._path.parent.mkdir(parents=True, exist_ok=True)
        self._run_name = run_name or self._path.stem
        self._echo = echo
        self._fh = self._path.open("a")

    @property
    def run_name(self) -> str:
        return self._run_name

    def meta(self, params=None, **kwargs):
        rec = {"kind": "meta", "params": params or kwargs, "time": time.time()}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def log(self, name, value, step):
        rec = {"kind": "metric", "name": name, "value": float(value), "step": int(step)}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._echo and step % 100 == 0:
            print(f"Step {step} {name}: {value}")

    def args(self, arg_text):
        self._fh.write(json.dumps({"kind": "args", "args": arg_text}) + "\n")
        self._fh.flush()


class TensorboardX:
    """Reference ``TensorboardX`` (loggers.py:27-41); lazy import."""

    def __init__(self, logdir: str, run_name: str):
        from tensorboardX import SummaryWriter  # optional dep

        self._writer = SummaryWriter(logdir=logdir)
        self.run_name = run_name

    def args(self, arg_text):
        self._writer.add_text("args", arg_text)

    def meta(self, params):
        self._writer.add_hparams(hparam_dict=params, metric_dict={})

    def log(self, name, value, step):
        self._writer.add_scalar(name, value, step)


class CometML:
    """Reference ``CometML`` (loggers.py:44-75); lazy import."""

    def __init__(self, api_key, project_name, workspace, debug=True, tags=None):
        from comet_ml import Experiment  # optional dep

        self._exp = Experiment(
            api_key=api_key,
            project_name=project_name,
            workspace=workspace,
            disabled=debug,
        )
        if not (self._exp.alive or debug):
            raise RuntimeError("Cannot connect to Comet ML")
        self._exp.disable_mp()
        if tags is not None:
            self._exp.add_tags(tags)

    @property
    def run_name(self):
        return self._exp.get_key()

    def args(self, arg_text):
        self._exp.log_parameter("cmd args", arg_text)

    def meta(self, params):
        self._exp.log_parameters(params)

    def log(self, name, value, step):
        self._exp.log_metric(name=name, value=value, step=step)


class WandB:
    """Reference ``WandB`` (loggers.py:78-97); lazy import."""

    def __init__(self, tags):
        import wandb  # optional dep

        self._wandb = wandb
        self._run = wandb.init(tags=tags, job_type="training")

    @property
    def run_name(self):
        return self._run.id

    def args(self, arg_text):
        self._wandb.config.update({"cmd args": arg_text})

    def meta(self, params):
        self._wandb.config.update(params)

    def log(self, name, value, step):
        self._wandb.log({name: value}, step=step)
