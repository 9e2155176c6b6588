"""Experiment logging: MLflow-compatible metric names, file-backed fallback.

The reference logs scalars through Lightning's MLFlowLogger and images as
MLflow artifacts (SURVEY.md §5.5; reference utils/train_utils.py:33-41,
scripts/train.py:53-68). Here a `RunLogger` always writes JSONL metrics and
PNG artifacts under a local run directory and, when `mlflow` is importable
and a tracking URI is configured, mirrors both to MLflow with the same
metric names (`train/loss`, `running_metrics/FID`, ...).
"""

import json
import os
import time
from typing import Dict, Optional


class RunLogger:
    def __init__(
        self,
        run_dir: str,
        experiment_name: str = "SynTraj-TimeVQVAE-TPU",
        run_name: Optional[str] = None,
        mlflow_uri: Optional[str] = None,
    ):
        self.run_dir = os.path.abspath(run_dir)
        os.makedirs(self.run_dir, exist_ok=True)
        self._metrics_f = open(os.path.join(self.run_dir, "metrics.jsonl"), "a")
        self._mlflow = None
        if mlflow_uri:
            try:
                import mlflow

                mlflow.set_tracking_uri(mlflow_uri)
                mlflow.set_experiment(experiment_name)
                self._mlflow = mlflow
                self._run = mlflow.start_run(run_name=run_name)
            except Exception as e:  # server absent: keep file logging only
                print(f"[logger] mlflow disabled: {e}")
                self._mlflow = None

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._metrics_f.write(json.dumps(rec) + "\n")
        self._metrics_f.flush()
        if self._mlflow:
            self._mlflow.log_metrics(
                {k.replace(":", "_"): float(v) for k, v in metrics.items()},
                step=int(step),
            )

    def log_image(self, fig, filename: str) -> None:
        """Save a matplotlib figure as an artifact (reference log_image,
        train_utils.py:33-41)."""
        path = os.path.join(self.run_dir, filename)
        fig.savefig(path, format="png", bbox_inches="tight")
        if self._mlflow:
            self._mlflow.log_artifact(path)

    def log_params(self, params: Dict) -> None:
        with open(os.path.join(self.run_dir, "params.json"), "w") as f:
            json.dump(params, f, indent=2, default=str)
        if self._mlflow:
            flat = {
                k: str(v)[:250] for k, v in params.items()
            }
            self._mlflow.log_params(flat)

    def close(self) -> None:
        self._metrics_f.close()
        if self._mlflow:
            self._mlflow.end_run()
