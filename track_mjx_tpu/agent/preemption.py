"""Preemption auto-resume: run-state JSON persistence and recovery.

Behavioral parity with track_mjx/agent/preemption.py:
- run-state JSON named run_state_{job_id}_{config_hash}.json in model_path
  (:68-76); job id from SLURM array / SLURM / PBS / SGE env or host+pid
  (:32-65); config MD5 hash over a sorted JSON dump (:24-29);
- atomic tempfile+rename writes (:79-91), fcntl shared-lock reads (:94-108);
- discover_existing_run_state validates keys, config hash, checkpoint dir and
  latest Orbax step (:111-173); save/cleanup/callback (:176-253).

On TPU this is the pod-slice-preemption resume contract: the same run-state
file drives restart-with-restore when the scheduler requeues the job.
"""

from __future__ import annotations

import fcntl
import hashlib
import json
import logging
import os
import socket
import tempfile
import time
from pathlib import Path
from typing import Any, Dict, Optional, Union

import orbax.checkpoint as ocp


def _to_plain_dict(cfg) -> dict:
    """Best-effort conversion of a config object to a plain dict."""
    if isinstance(cfg, dict):
        return cfg
    if hasattr(cfg, "to_dict"):
        return cfg.to_dict()
    if hasattr(cfg, "__dict__"):
        return dict(cfg.__dict__)
    raise TypeError(f"cannot hash config of type {type(cfg)}")


def _hash_config(cfg) -> str:
    """Stable 12-hex-char MD5 of the config contents."""
    cfg_dict = _to_plain_dict(cfg)
    cfg_str = json.dumps(cfg_dict, sort_keys=True, default=str)
    return hashlib.md5(cfg_str.encode()).hexdigest()[:12]


def _get_job_identifier() -> str:
    """Unique job id: SLURM array > SLURM > PBS > SGE > host+pid."""
    job_id = os.environ.get("SLURM_ARRAY_JOB_ID")
    task_id = os.environ.get("SLURM_ARRAY_TASK_ID")
    if job_id and task_id:
        return f"slurm_{job_id}_{task_id}"
    job_id = os.environ.get("SLURM_JOB_ID")
    if job_id:
        return f"slurm_{job_id}"
    pbs_job_id = os.environ.get("PBS_JOBID")
    if pbs_job_id:
        return f"pbs_{pbs_job_id}"
    sge_job_id = os.environ.get("JOB_ID")
    sge_task_id = os.environ.get("SGE_TASK_ID")
    if sge_job_id:
        if sge_task_id:
            return f"sge_{sge_job_id}_{sge_task_id}"
        return f"sge_{sge_job_id}"
    return f"local_{socket.gethostname()}_{os.getpid()}"


def _get_run_state_file_path(cfg) -> Path:
    cfg_dict = _to_plain_dict(cfg)
    base_path = Path(cfg_dict["logging_config"]["model_path"]).resolve()
    return base_path / f"run_state_{_get_job_identifier()}_{_hash_config(cfg)}.json"


def _atomic_write_json(file_path: Path, data: Dict[str, Any]) -> None:
    """Write-then-rename so readers never observe a torn file."""
    file_path.parent.mkdir(parents=True, exist_ok=True)
    with tempfile.NamedTemporaryFile(
        mode="w", dir=file_path.parent, delete=False, suffix=".tmp"
    ) as tmp_file:
        json.dump(data, tmp_file, indent=2)
        tmp_name = tmp_file.name
    Path(tmp_name).rename(file_path)


def _read_json_with_lock(file_path: Path) -> Optional[Dict[str, Any]]:
    """Shared-lock JSON read (protects against concurrent array tasks)."""
    if not file_path.exists():
        return None
    try:
        with open(file_path, "r") as f:
            fcntl.flock(f.fileno(), fcntl.LOCK_SH)
            data = json.load(f)
            fcntl.flock(f.fileno(), fcntl.LOCK_UN)
            return data
    except (json.JSONDecodeError, OSError) as e:
        logging.warning("Failed to read run state file %s: %s", file_path, e)
        return None


def discover_existing_run_state(cfg) -> Optional[Dict[str, Any]]:
    """Finds and validates a prior run state for this job+config, returning it
    (with latest_checkpoint_step filled in) or None."""
    state_file_path = _get_run_state_file_path(cfg)
    logging.info("Looking for existing run state at: %s", state_file_path)

    run_state = _read_json_with_lock(state_file_path)
    if not run_state:
        logging.info("No existing run state found")
        return None

    required_keys = ["run_id", "checkpoint_path", "wandb_run_id", "config_hash"]
    if not all(key in run_state for key in required_keys):
        logging.warning("Run state file is missing required keys, ignoring")
        return None

    current_config_hash = _hash_config(cfg)
    if run_state["config_hash"] != current_config_hash:
        logging.warning(
            "Config hash mismatch (saved: %s, current: %s), ignoring run state",
            run_state["config_hash"],
            current_config_hash,
        )
        return None

    checkpoint_path = Path(run_state["checkpoint_path"])
    if not checkpoint_path.exists():
        logging.warning(
            "Checkpoint directory %s not found, ignoring run state", checkpoint_path
        )
        return None

    try:
        ckpt_mgr = ocp.CheckpointManager(
            checkpoint_path,
            options=ocp.CheckpointManagerOptions(
                create=False, step_prefix="PPONetwork"
            ),
        )
        latest_step = ckpt_mgr.latest_step()
        if latest_step is None:
            logging.warning(
                "No valid checkpoints found in directory, ignoring run state"
            )
            return None
        run_state["latest_checkpoint_step"] = latest_step
        logging.info("Found valid run state with checkpoint at step %s", latest_step)
        return run_state
    except Exception as e:  # noqa: BLE001 - any access failure means "no resume"
        logging.warning(
            "Failed to access checkpoint manager: %s, ignoring run state", e
        )
        return None


def save_run_state(
    cfg,
    run_id: str,
    checkpoint_path: Union[Path, str],
    wandb_run_id: str,
    latest_step: Optional[int] = None,
) -> None:
    """Persists the current run state for discovery after preemption."""
    state_file_path = _get_run_state_file_path(cfg)
    if isinstance(checkpoint_path, str):
        checkpoint_path = Path(checkpoint_path)
    run_state = {
        "run_id": run_id,
        "checkpoint_path": str(checkpoint_path.resolve()),
        "wandb_run_id": wandb_run_id,
        "config_hash": _hash_config(cfg),
        "timestamp": time.time(),
    }
    if latest_step is not None:
        run_state["latest_checkpoint_step"] = latest_step
    try:
        _atomic_write_json(state_file_path, run_state)
        logging.info("Saved run state to %s", state_file_path)
    except Exception as e:  # noqa: BLE001
        logging.error("Failed to save run state: %s", e)


def cleanup_run_state(cfg) -> None:
    """Removes the run-state file after successful completion."""
    state_file_path = _get_run_state_file_path(cfg)
    try:
        if state_file_path.exists():
            state_file_path.unlink()
            logging.info("Cleaned up run state file: %s", state_file_path)
    except Exception as e:  # noqa: BLE001
        logging.warning("Failed to cleanup run state file: %s", e)


def create_checkpoint_callback(
    cfg, run_id: str, checkpoint_path: Union[Path, str], wandb_run_id: str
):
    """Returns a callback refreshing the run state after every checkpoint."""

    def checkpoint_callback(step: int):
        try:
            save_run_state(
                cfg=cfg,
                run_id=run_id,
                checkpoint_path=checkpoint_path,
                wandb_run_id=wandb_run_id,
                latest_step=step,
            )
            logging.debug("Updated run state after checkpoint save at step %s", step)
        except Exception as e:  # noqa: BLE001
            logging.warning(
                "Failed to update run state after checkpoint save: %s", e
            )

    return checkpoint_callback
