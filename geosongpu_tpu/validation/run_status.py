"""Run reproducibility record (analog of
/root/reference/src/tcn/validation/geos_status.py:16-74, which records mepo
component SHAs; here: repo SHA + dirty flag + config hash + jax/device
fingerprint, comparable across runs)."""
from __future__ import annotations

import hashlib
import json
import subprocess
from dataclasses import asdict, dataclass
from typing import Optional


@dataclass
class RunStatus:
    git_sha: str
    git_dirty: bool
    config_hash: str
    jax_version: str
    backend: str
    devices: str

    def same_code(self, other: "RunStatus") -> bool:
        return (self.git_sha == other.git_sha
                and not self.git_dirty and not other.git_dirty)

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "RunStatus":
        return cls(**json.loads(s))


def _git(args, cwd=None) -> str:
    try:
        return subprocess.run(["git"] + args, cwd=cwd, capture_output=True,
                              text=True, timeout=10).stdout.strip()
    except Exception:
        return ""


def capture(config: Optional[dict] = None, repo_dir: str = ".") -> RunStatus:
    import jax

    sha = _git(["rev-parse", "HEAD"], repo_dir) or "unknown"
    dirty = bool(_git(["status", "--porcelain"], repo_dir))
    chash = hashlib.sha256(
        json.dumps(config or {}, sort_keys=True).encode()).hexdigest()[:16]
    return RunStatus(
        git_sha=sha,
        git_dirty=dirty,
        config_hash=chash,
        jax_version=jax.__version__,
        backend=jax.default_backend(),
        devices=str(jax.devices()),
    )
