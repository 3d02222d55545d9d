"""Experiment orchestration (reference nm/experiment.py).

Owns the Configuration, output directory, provenance copies, model
build, training, and batch inference. The ``[main]`` argument set
matches the reference so existing experiment INIs run unchanged
(SURVEY.md §6 config contract).
"""

from __future__ import annotations

import os
import random
import shutil
import subprocess
import time
from typing import Any, Dict, List, Optional

import numpy as np

from .checking import check_dataset_and_coders, check_series_collisions
from .config.configuration import Configuration
from .dataset import BatchingScheme, Dataset
from .learning_utils import (evaluation, normalize_evaluation,
                             print_final_evaluation, run_on_dataset,
                             training_loop)
from .logging import Logging, log, warn
from .model.part import collect_parts
from .runtime import TPUManager

_TRAIN_ARGS = [
    ("name", False, "translation"),
    ("output", True, None),
    ("epochs", True, None),
    ("batch_size", False, 16),
    ("batching_scheme", False, None),
    ("train_dataset", True, None),
    ("val_dataset", False, None),
    ("val_datasets", False, None),
    ("trainer", True, None),
    ("runners", True, None),
    ("evaluation", False, []),
    ("postprocess", False, None),
    ("runners_batch_size", False, None),
    ("logging_period", False, 20),
    ("validation_period", False, 500),
    ("test_datasets", False, None),
    ("initial_variables", False, None),
    ("overwrite_output_dir", False, False),
    ("random_seed", False, 2574600),
    ("tf_manager", False, None),
    ("visualize_embeddings", False, None),
    ("minimize", False, None),
    ("compute_dtype", False, None),
    ("compilation_cache", False, True),
    ("compilation_cache_dir", False, None),
]


class Experiment:

    def __init__(self, config_path: str,
                 train_mode: bool = True,
                 overwrite_output_dir: bool = False,
                 config_changes: Optional[List[str]] = None) -> None:
        self.config_path = config_path
        self.config_changes = list(config_changes or [])
        self.train_mode = train_mode
        self.graph_built = False
        self.cont_index = -1

        self.config = Configuration()
        for name, required, default in _TRAIN_ARGS:
            self.config.add_argument(name, required=(
                required and train_mode), default=default)
        self.config.load_file(config_path, config_changes)
        if overwrite_output_dir:
            self.config.config_dict.setdefault("main", {})
            self.config.config_dict["main"]["overwrite_output_dir"] = True

        main = self.config.config_dict.get("main", {})
        self.output_dir = main.get("output")
        self.model: Any = None
        self.tf_manager: Optional[TPUManager] = None

    # ------------------------------------------------------------------ #
    @property
    def _var_path(self) -> str:
        return os.path.join(self.output_dir, "variables.data")

    def _setup_output_dir(self) -> None:
        if self.output_dir is None:
            return
        if os.path.isdir(self.output_dir):
            cont_path = os.path.join(self.output_dir, "variables.data")
            has_vars = any(
                name.startswith("variables.data")
                for name in os.listdir(self.output_dir))
            overwrite = self.config.config_dict["main"].get(
                "overwrite_output_dir") in (True, "True")
            if self.train_mode and has_vars and not overwrite:
                # continuation run: index the artifacts (reference's
                # *.cont-N convention)
                self.cont_index = 1
                while os.path.exists(os.path.join(
                        self.output_dir,
                        f"experiment.ini.cont-{self.cont_index}")):
                    self.cont_index += 1
        else:
            os.makedirs(self.output_dir, exist_ok=True)

        if self.train_mode:
            from .parallel.distributed import (is_main_process,
                                               process_index)
            suffix = (f".cont-{self.cont_index}"
                      if self.cont_index > 0 else "")
            if is_main_process():
                ini_copy = os.path.join(self.output_dir,
                                        f"experiment.ini{suffix}")
                if self.config_changes:
                    # a verbatim copy would lie about the run (CLI
                    # overrides were applied on top of the file) —
                    # write the EFFECTIVE config so later run/--cont
                    # opens what actually trained; keep the pristine
                    # original alongside
                    from .config.parsing import write_file
                    write_file(self.config.raw_config, ini_copy)
                    shutil.copyfile(
                        self.config_path,
                        os.path.join(self.output_dir,
                                     f"experiment.orig.ini{suffix}"))
                else:
                    shutil.copyfile(self.config_path, ini_copy)
                self._save_git_info(suffix)
            # per-process log files on shared storage (plain
            # experiment.log on the main process, as the reference)
            proc = process_index()
            log_suffix = suffix + (f".p{proc}" if proc else "")
            Logging.set_log_file(
                os.path.join(self.output_dir,
                             f"experiment.log{log_suffix}"))

    def _save_git_info(self, suffix: str = "") -> None:
        try:
            commit = subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True,
                text=True, timeout=5,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            if commit.returncode == 0:
                with open(os.path.join(
                        self.output_dir, f"git_commit{suffix}"),
                        "w", encoding="utf-8") as f:
                    f.write(commit.stdout)
        except (OSError, subprocess.SubprocessError):
            pass

    # ------------------------------------------------------------------ #
    def build_model(self) -> None:
        if self.graph_built:
            return
        self.config.build_model(warn_unused=self.train_mode)
        self.model = self.config.model
        self.graph_built = True

        from .ops.policy import set_compute_dtype
        set_compute_dtype(getattr(self.model, "compute_dtype", None))

        from .utils.compilation_cache import enable_compilation_cache
        enable_compilation_cache(
            cache_dir=getattr(self.model, "compilation_cache_dir", None),
            enabled=getattr(self.model, "compilation_cache", True))

        seed = getattr(self.model, "random_seed", None) or 2574600
        random.seed(seed)
        np.random.seed(seed)

        self.tf_manager = getattr(self.model, "tf_manager", None)
        if self.tf_manager is None:
            self.tf_manager = TPUManager()
        if getattr(self.model, "minimize", None) is not None:
            self.tf_manager.minimize_metric = bool(self.model.minimize)

        roots: List[Any] = []
        trainer = getattr(self.model, "trainer", None)
        if trainer is not None:
            roots.extend(trainer if isinstance(trainer, list)
                         else [trainer])
        roots.extend(getattr(self.model, "runners", []) or [])
        self.tf_manager.initialize_model_parts(roots, seed=seed)

        initial_variables = getattr(self.model, "initial_variables", None)
        if initial_variables:
            self.tf_manager.restore(initial_variables)

        check_series_collisions(self.model.runners)

    # ------------------------------------------------------------------ #
    def train(self) -> None:
        if not self.train_mode:
            raise RuntimeError("train() needs train_mode=True")
        self._setup_output_dir()
        self.build_model()
        model = self.model

        trainer = model.trainer
        if isinstance(trainer, list):
            if len(trainer) > 1:
                from .trainers.multitask_trainer import MultitaskTrainer
                trainer = MultitaskTrainer(trainer)
            else:
                trainer = trainer[0]

        if self.cont_index > 0:
            # resume from the latest saved variables + optimizer state
            latest = self._latest_checkpoint()
            if latest:
                self.tf_manager.restore([latest])
                self.tf_manager.load_optimizer_state(
                    os.path.join(self.output_dir, "variables.data"))
                log(f"Continuation run: restored {latest}")

        batching = model.batching_scheme or BatchingScheme(
            batch_size=model.batch_size)
        runners_batching = BatchingScheme(
            batch_size=model.runners_batch_size or model.batch_size)

        val_datasets: List[Dataset] = []
        if getattr(model, "val_dataset", None) is not None:
            vd = model.val_dataset
            val_datasets.extend(vd if isinstance(vd, list) else [vd])
        if getattr(model, "val_datasets", None):
            val_datasets.extend(model.val_datasets)

        parts = self.tf_manager.parts
        check_dataset_and_coders(model.train_dataset, parts)
        for vd in val_datasets:
            check_dataset_and_coders(vd, parts)

        training_loop(
            tf_manager=self.tf_manager,
            epochs=model.epochs,
            trainer=trainer,
            batching_scheme=batching,
            runners_batching_scheme=runners_batching,
            train_dataset=model.train_dataset,
            val_datasets=val_datasets,
            evaluation_spec=model.evaluation,
            runners=model.runners,
            test_datasets=getattr(model, "test_datasets", None),
            logging_period=model.logging_period,
            validation_period=model.validation_period,
            postprocess=model.postprocess,
            output_dir=self.output_dir)

        if getattr(model, "visualize_embeddings", None):
            self._write_embedding_projections(model.visualize_embeddings)

    def _write_embedding_projections(self, sequences) -> None:
        """[main] visualize_embeddings support (reference nm/train.py:
        TensorBoard embedding projector). Writes, per embedded
        sequence, ``<output>/<name>_embeddings.tsv`` (one vector per
        row) and ``<name>_metadata.tsv`` (the vocabulary tokens) —
        directly loadable into the projector or any external tool."""
        from .parallel.distributed import is_main_process
        if not is_main_process():
            return
        sequences = (sequences if isinstance(sequences, list)
                     else [sequences])
        params = self.tf_manager.params
        for seq in sequences:
            key = seq.param_key
            table = params.get(key, {}).get("embeddings")
            if table is None:
                warn(f"visualize_embeddings: part '{seq.name}' has no "
                     "embeddings table; skipped")
                continue
            table = np.asarray(table)
            vec_path = os.path.join(self.output_dir,
                                    f"{seq.name}_embeddings.tsv")
            meta_path = os.path.join(self.output_dir,
                                     f"{seq.name}_metadata.tsv")
            with open(vec_path, "w", encoding="utf-8") as f:
                for row in table:
                    f.write("\t".join(f"{x:.6g}" for x in row) + "\n")
            with open(meta_path, "w", encoding="utf-8") as f:
                for token in seq.vocabulary.index_to_word:
                    f.write(token + "\n")
            log(f"Embedding projection for '{seq.name}' written to "
                f"{vec_path}")

    def _latest_checkpoint(self) -> Optional[str]:
        """Most recent checkpoint for continuation (reference Saver
        semantics: resume from the latest save, not the best one)."""
        if not self.output_dir or not os.path.isdir(self.output_dir):
            return None
        candidates = sorted(
            (name for name in os.listdir(self.output_dir)
             if name.startswith("variables.data-")
             and not name.endswith(".json")),
            key=lambda n: int(n.rsplit("-", 1)[-1]))
        if candidates:
            return os.path.join(self.output_dir, candidates[-1])
        best = os.path.join(self.output_dir, "variables.data.best")
        if os.path.exists(best):
            return best
        return None

    # ------------------------------------------------------------------ #
    def run_model(self, dataset: Dataset,
                  write_out: bool = False,
                  batch_size: int = None):
        """Batch inference (reference call stack SURVEY.md §4.2)."""
        self.build_model()
        model = self.model
        if not self.tf_manager.params_list:
            raise RuntimeError("No parameters loaded")
        check_dataset_and_coders(dataset, self.tf_manager.parts)
        scheme = BatchingScheme(
            batch_size=batch_size or model.runners_batch_size
            or model.batch_size or 16)
        results, outputs = run_on_dataset(
            self.tf_manager, model.runners, dataset,
            postprocess=model.postprocess,
            batching_scheme=scheme, write_out=write_out)
        evaluators = normalize_evaluation(model.evaluation)
        eval_result = evaluation(evaluators, dataset, results, outputs)
        if eval_result:
            print_final_evaluation(dataset.name, eval_result)
        return results, outputs

    def restore_variables(self, paths: Optional[List[str]] = None,
                          average: bool = False) -> None:
        self.build_model()
        if paths is None:
            latest = self._latest_checkpoint()
            if latest is None:
                raise FileNotFoundError(
                    f"No checkpoint found in {self.output_dir}")
            paths = [latest]
        self.tf_manager.restore(paths, average=average)
