"""Checkpoint / resume.

Parity target: the reference wrapper's ``save`` / ``checkpoint`` /
``load_checkpoint`` (SURVEY.md SS2.9/SS3.5/SS5.4, marker ``exp:``):
a best-model file (``<name>.mdl``) plus a rolling latest checkpoint
(``<name>.mdl.checkpoint``) holding {args, word_dict, state_dict,
optimizer, epoch}; ``--pretrained`` warm-starts from another run's best
file; resume restores optimizer + epoch and continues.

TPU-native design: the train state (params + optimizer + step) is one
PyTree serialized with flax msgpack; config and vocabulary are JSON
sidecars inside a checkpoint *directory*.  Saves are atomic
(write-to-temp + rename) and optionally asynchronous on a background
thread (SURVEY.md SS5.4 "async save") so the device never waits on disk.
Deterministic resume: checkpoints are written at epoch boundaries and
``extra`` records the epoch + shuffle seed; combined with the
deterministic iterator (data/dataset.py) training continues exactly at
the next epoch (SURVEY.md SS5.3; the iterator also supports mid-epoch
``start_batch`` for finer-grained schemes).
"""

from __future__ import annotations

import json
import shutil
import threading
from pathlib import Path
from typing import Any, Optional

import jax
from flax import serialization

from ..config import ModelConfig, override_model_args
from ..data.dictionary import Dictionary

STATE_FILE = "state.msgpack"
ORBAX_DIR = "state.orbax"
CONFIG_FILE = "config.json"
VOCAB_FILE = "vocab.json"
EXTRA_FILE = "extra.json"


class Checkpointer:
    """Directory-per-checkpoint saver with best/latest slots.

    ``backend='msgpack'`` (default) serializes the state PyTree with flax
    msgpack in one file; ``backend='orbax'`` stores it via
    ``orbax.checkpoint.StandardCheckpointer`` (sharding-aware, per-array
    files -- the right choice once states outgrow host RAM).  Both share
    the JSON sidecars and the best/latest layout; ``load`` auto-detects
    which backend wrote a checkpoint.
    """

    def __init__(self, model_dir: str | Path, model_name: str,
                 async_save: bool = True, backend: str = "msgpack"):
        self.dir = Path(model_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.model_name = model_name
        self.async_save = async_save
        assert backend in ("msgpack", "orbax")
        self.backend = backend
        self._thread: Optional[threading.Thread] = None

    @property
    def best_path(self) -> Path:
        return self.dir / f"{self.model_name}.mdl"

    @property
    def latest_path(self) -> Path:
        return self.dir / f"{self.model_name}.mdl.checkpoint"

    # -- saving --------------------------------------------------------------

    def save_best(self, state, config, word_dict, extra=None):
        self._save(self.best_path, state, config, word_dict, extra or {})

    def save_latest(self, state, config, word_dict, extra=None):
        self._save(self.latest_path, state, config, word_dict, extra or {})

    def _save(self, path: Path, state, config: ModelConfig,
              word_dict: Dictionary, extra: dict):
        # snapshot to host synchronously (cheap); write to disk async
        state = jax.device_get(state)
        blob = (serialization.to_bytes(state)
                if self.backend == "msgpack" else None)
        cfg_json = config.to_json()
        vocab_json = word_dict.to_json()
        extra_json = json.dumps(extra)
        self.wait()

        def write():
            tmp = path.with_suffix(path.suffix + ".tmp")
            if tmp.exists():
                shutil.rmtree(tmp)
            tmp.mkdir(parents=True)
            if blob is not None:
                (tmp / STATE_FILE).write_bytes(blob)
            else:
                import orbax.checkpoint as ocp

                ckptr = ocp.StandardCheckpointer()
                ckptr.save((tmp / ORBAX_DIR).resolve(), state)
                ckptr.wait_until_finished()
                ckptr.close()
            (tmp / CONFIG_FILE).write_text(cfg_json)
            (tmp / VOCAB_FILE).write_text(vocab_json)
            (tmp / EXTRA_FILE).write_text(extra_json)
            # Crash-safe swap: never a moment where no complete copy
            # exists on disk.  The prior checkpoint is renamed aside (not
            # deleted) before the new one takes its place; readers fall
            # back to the ``.old`` copy for the one-rename window where
            # the primary name is vacant (``resolve``).
            if path.exists():
                old = path.with_suffix(path.suffix + ".old")
                if old.exists():
                    shutil.rmtree(old)
                path.rename(old)
                tmp.rename(path)
                shutil.rmtree(old, ignore_errors=True)
            else:
                tmp.rename(path)

        if self.async_save:
            self._thread = threading.Thread(target=write, daemon=True)
            self._thread.start()
        else:
            write()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    # -- loading -------------------------------------------------------------

    @staticmethod
    def resolve(path: str | Path) -> Path:
        """The readable copy of a checkpoint: the primary directory, or
        the rename-aside ``.old`` copy if a crash landed inside the
        (tiny) swap window where the primary name was vacant."""
        path = Path(path)
        if path.exists():
            return path
        old = path.with_suffix(path.suffix + ".old")
        return old if old.exists() else path

    @staticmethod
    def peek(path: str | Path) -> tuple[ModelConfig, Dictionary, dict]:
        """Read config/vocab/extra without a state template (for rebuild)."""
        path = Checkpointer.resolve(path)
        config = ModelConfig.from_json((path / CONFIG_FILE).read_text())
        vocab = Dictionary.from_json((path / VOCAB_FILE).read_text())
        extra = json.loads((path / EXTRA_FILE).read_text())
        return config, vocab, extra

    @staticmethod
    def load(path: str | Path, state_template) -> Any:
        """Restore a train state into ``state_template``'s structure
        (backend auto-detected from the checkpoint contents)."""
        path = Checkpointer.resolve(path)
        if (path / STATE_FILE).exists():
            blob = (path / STATE_FILE).read_bytes()
            try:
                return serialization.from_bytes(state_template, blob)
            except ValueError as e:
                # a structure mismatch (e.g. the optimizer layout changed
                # between the writing and reading code versions) surfaces
                # from flax as a bare list-size error deep in the
                # opt_state tree -- name the actual problem and the way
                # out instead (round-5 rehearsal post-mortem)
                raise ValueError(
                    f"checkpoint at {path} does not match the current "
                    "train-state structure (commonly: it was written by "
                    "an older code version with a different optimizer "
                    "layout). Retrain, or load params only via "
                    f"Checkpointer.peek + model init. Original: {e}"
                ) from e
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        try:
            return ckptr.restore((path / ORBAX_DIR).resolve(),
                                 state_template)
        finally:
            ckptr.close()

    @staticmethod
    def load_for_test(path: str | Path,
                      new_config: ModelConfig) -> tuple[ModelConfig,
                                                        Dictionary, dict]:
        """Reference ``override_model_args``: checkpoint architecture wins,
        runtime flags come from the new invocation."""
        saved_config, vocab, extra = Checkpointer.peek(path)
        return override_model_args(saved_config, new_config), vocab, extra
