"""Preemption auto-resume: durable run-state records keyed by (job, config).

Equivalent capability to track_mjx/agent/preemption.py (run-state JSON files
that let a requeued job rediscover its checkpoint + wandb run), redesigned
around a single ``RunStateStore`` object that owns the identity computation
(scheduler job id + config hash), the on-disk record format, and the
validation pipeline. On TPU pods this is the slice-preemption resume
contract, and it is multihost-aware: only the coordinator process writes or
removes records, so N hosts restarting simultaneously cannot race each other
on the shared filesystem (the single-process reference has no such layer).

Durability properties (same guarantees the reference provides):
- writes are tempfile+rename, so readers never observe a torn file;
- reads take a shared fcntl lock, so concurrent array tasks on one node
  cannot interleave with a writer on NFS-like filesystems;
- a record is only acted on after validation: required keys present, config
  hash matches the current run, the checkpoint directory exists and holds at
  least one committed Orbax step.

File format on disk (JSON, one file per job+config):
    run_state_{job_id}_{config_hash}.json in logging_config.model_path
with keys run_id / checkpoint_path / wandb_run_id / config_hash / timestamp
[/ latest_checkpoint_step].
"""

from __future__ import annotations

import dataclasses
import fcntl
import hashlib
import json
import logging
import os
import socket
import tempfile
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Union

_REQUIRED_KEYS = ("run_id", "checkpoint_path", "wandb_run_id", "config_hash")

# scheduler identity probes, most specific first: (prefix, env keys, n_optional
# trailing keys). The first probe whose required keys are all set wins.
_SCHEDULERS = (
    ("slurm", ("SLURM_ARRAY_JOB_ID", "SLURM_ARRAY_TASK_ID"), 0),
    ("slurm", ("SLURM_JOB_ID",), 0),
    ("pbs", ("PBS_JOBID",), 0),
    ("sge", ("JOB_ID", "SGE_TASK_ID"), 1),
)


def job_identifier() -> str:
    """Stable id for this job across a preemption/requeue cycle."""
    env = os.environ
    for prefix, keys, n_optional in _SCHEDULERS:
        required = keys[: len(keys) - n_optional] if n_optional else keys
        if all(env.get(k) for k in required):
            present = [env[k] for k in keys if env.get(k)]
            return "_".join((prefix, *present))
    # no scheduler: host+pid still dedupes concurrent local runs, though it
    # cannot survive a restart (nothing identifies "the same" local run)
    return f"local_{socket.gethostname()}_{os.getpid()}"


def _config_dict(cfg) -> dict:
    if isinstance(cfg, dict):
        return cfg
    if hasattr(cfg, "to_dict"):
        return cfg.to_dict()
    if hasattr(cfg, "__dict__"):
        return dict(cfg.__dict__)
    raise TypeError(f"cannot hash config of type {type(cfg)}")


def config_hash(cfg) -> str:
    """12-hex-char digest over the sorted JSON dump of the config."""
    payload = json.dumps(_config_dict(cfg), sort_keys=True, default=str)
    return hashlib.md5(payload.encode()).hexdigest()[:12]


def _is_coordinator() -> bool:
    """True on the process allowed to mutate shared run-state files."""
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # noqa: BLE001 - before jax init, act as coordinator
        return True


@dataclasses.dataclass
class RunStateStore:
    """Owns the run-state record for one (job, config) identity."""

    cfg: Any

    def __post_init__(self):
        cfg_dict = _config_dict(self.cfg)
        base = Path(cfg_dict["logging_config"]["model_path"]).resolve()
        self._hash = config_hash(self.cfg)
        self._path = base / f"run_state_{job_identifier()}_{self._hash}.json"

    @property
    def path(self) -> Path:
        return self._path

    # ---- record IO -------------------------------------------------------

    def _read_locked(self) -> Optional[Dict[str, Any]]:
        if not self._path.exists():
            return None
        try:
            with open(self._path, "r") as f:
                fcntl.flock(f.fileno(), fcntl.LOCK_SH)
                try:
                    return json.load(f)
                finally:
                    fcntl.flock(f.fileno(), fcntl.LOCK_UN)
        except (json.JSONDecodeError, OSError) as e:
            logging.warning("Failed to read run state %s: %s", self._path, e)
            return None

    def _write_atomic(self, record: Dict[str, Any]) -> None:
        self._path.parent.mkdir(parents=True, exist_ok=True)
        with tempfile.NamedTemporaryFile(
            mode="w", dir=self._path.parent, delete=False, suffix=".tmp"
        ) as tmp:
            json.dump(record, tmp, indent=2)
            name = tmp.name
        Path(name).rename(self._path)

    # ---- lifecycle -------------------------------------------------------

    def discover(self) -> Optional[Dict[str, Any]]:
        """Returns a validated prior record (with latest_checkpoint_step
        filled from the Orbax directory) or None."""
        logging.info("Looking for existing run state at: %s", self._path)
        record = self._read_locked()
        if not record:
            logging.info("No existing run state found")
            return None
        if not all(k in record for k in _REQUIRED_KEYS):
            logging.warning("Run state file is missing required keys, ignoring")
            return None
        if record["config_hash"] != self._hash:
            logging.warning(
                "Config hash mismatch (saved: %s, current: %s), ignoring "
                "run state",
                record["config_hash"],
                self._hash,
            )
            return None
        step = _latest_committed_step(Path(record["checkpoint_path"]))
        if step is None:
            return None
        record["latest_checkpoint_step"] = step
        logging.info("Found valid run state with checkpoint at step %s", step)
        return record

    def save(
        self,
        run_id: str,
        checkpoint_path: Union[Path, str],
        wandb_run_id: str,
        latest_step: Optional[int] = None,
    ) -> None:
        if not _is_coordinator():
            return
        record = {
            "run_id": run_id,
            "checkpoint_path": str(Path(checkpoint_path).resolve()),
            "wandb_run_id": wandb_run_id,
            "config_hash": self._hash,
            "timestamp": time.time(),
        }
        if latest_step is not None:
            record["latest_checkpoint_step"] = latest_step
        try:
            self._write_atomic(record)
            logging.info("Saved run state to %s", self._path)
        except Exception as e:  # noqa: BLE001
            logging.error("Failed to save run state: %s", e)

    def clear(self) -> None:
        if not _is_coordinator():
            return
        try:
            if self._path.exists():
                self._path.unlink()
                logging.info("Cleaned up run state file: %s", self._path)
        except Exception as e:  # noqa: BLE001
            logging.warning("Failed to cleanup run state file: %s", e)

    def checkpoint_callback(
        self, run_id: str, checkpoint_path: Union[Path, str], wandb_run_id: str
    ) -> Callable[[int], None]:
        """A per-checkpoint hook that refreshes the record with the new step."""

        def on_checkpoint(step: int):
            try:
                self.save(run_id, checkpoint_path, wandb_run_id, latest_step=step)
            except Exception as e:  # noqa: BLE001
                logging.warning(
                    "Failed to update run state after checkpoint save: %s", e
                )

        return on_checkpoint


def _latest_committed_step(checkpoint_path: Path) -> Optional[int]:
    """Latest committed Orbax step in the directory, or None if unusable."""
    import orbax.checkpoint as ocp

    if not checkpoint_path.exists():
        logging.warning(
            "Checkpoint directory %s not found, ignoring run state",
            checkpoint_path,
        )
        return None
    try:
        mgr = ocp.CheckpointManager(
            checkpoint_path,
            options=ocp.CheckpointManagerOptions(
                create=False, step_prefix="PPONetwork"
            ),
        )
        step = mgr.latest_step()
        if step is None:
            logging.warning(
                "No valid checkpoints found in directory, ignoring run state"
            )
        return step
    except Exception as e:  # noqa: BLE001 - any access failure means no resume
        logging.warning(
            "Failed to access checkpoint manager: %s, ignoring run state", e
        )
        return None


# ---- functional API (what train.py and tests call) -------------------------


def discover_existing_run_state(cfg) -> Optional[Dict[str, Any]]:
    return RunStateStore(cfg).discover()


def save_run_state(
    cfg,
    run_id: str,
    checkpoint_path: Union[Path, str],
    wandb_run_id: str,
    latest_step: Optional[int] = None,
) -> None:
    RunStateStore(cfg).save(run_id, checkpoint_path, wandb_run_id, latest_step)


def cleanup_run_state(cfg) -> None:
    RunStateStore(cfg).clear()


def create_checkpoint_callback(
    cfg, run_id: str, checkpoint_path: Union[Path, str], wandb_run_id: str
):
    return RunStateStore(cfg).checkpoint_callback(
        run_id, checkpoint_path, wandb_run_id
    )
