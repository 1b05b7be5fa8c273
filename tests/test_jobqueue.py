"""Managed-job submission/polling (the sbatch+sacct analog).

Reference behavior under test: submit -> poll-until-terminal -> surface
failures (/root/reference/src/tcn/ci/utils/shell.py:86-100).  The local
backend runs real detached processes; the queued-resource backend runs
against an injected fake gcloud runner (the serializer-injection test
pattern)."""
import json
import time

import pytest

from geosongpu_tpu.harness.jobqueue import (JobQueueError, JobState,
                                            LocalBackend,
                                            QueuedResourceBackend,
                                            wait_for_job)


def test_local_backend_completes(tmp_path):
    be = LocalBackend(str(tmp_path))
    h = be.submit(["echo hello", "sleep 0.3", "echo done"], "okjob")
    st = wait_for_job(be, h, poll_s=0.1, timeout_s=30)
    assert st == JobState.COMPLETED
    log = (tmp_path / "okjob.log").read_text()
    assert "hello" in log and "done" in log


def test_local_backend_failure_surfaces(tmp_path):
    be = LocalBackend(str(tmp_path))
    h = be.submit(["echo start", "false"], "failjob")
    st = wait_for_job(be, h, poll_s=0.1, timeout_s=30)
    assert st == JobState.FAILED


def test_local_backend_timeout_cancels(tmp_path):
    be = LocalBackend(str(tmp_path))
    h = be.submit(["sleep 60"], "slowjob")
    with pytest.raises(JobQueueError):
        wait_for_job(be, h, poll_s=0.1, timeout_s=0.5)
    # the cancel really killed it
    time.sleep(0.3)
    assert be.state(h) in (JobState.FAILED, JobState.COMPLETED)


class _FakeGcloud:
    """State-machine fake: PROVISIONING x2 -> ACTIVE x2 -> deleted."""

    def __init__(self):
        self.calls = []
        self._describes = 0

    def __call__(self, cmd):
        self.calls.append(cmd)
        verb = cmd[4]
        if verb == "create":
            assert "--metadata" in cmd
            return "{}"
        if verb == "describe":
            self._describes += 1
            if self._describes <= 2:
                return json.dumps({"state": {"state": "PROVISIONING"}})
            if self._describes <= 4:
                return json.dumps({"state": {"state": "ACTIVE"}})
            raise JobQueueError("NOT_FOUND")  # deleted after completion
        if verb == "delete":
            return "{}"
        raise AssertionError(cmd)


def test_queued_resource_lifecycle():
    fake = _FakeGcloud()
    be = QueuedResourceBackend("proj", "us-central1-a", runner=fake)
    h = be.submit(["python bench.py"], "hsrun")
    assert h.job_id.startswith("hsrun-")
    assert be.state(h) == JobState.PENDING     # PROVISIONING
    assert be.state(h) == JobState.PENDING
    assert be.state(h) == JobState.RUNNING     # ACTIVE
    st = wait_for_job(be, h, poll_s=0.01, timeout_s=10)
    assert st == JobState.COMPLETED            # describe -> NOT_FOUND
    create = fake.calls[0]
    assert create[:5] == ["gcloud", "compute", "tpus", "queued-resources",
                          "create"]
    assert any("startup-script=python bench.py" in c for c in create)


def test_queued_resource_failed_state():
    class _FailFake(_FakeGcloud):
        def __call__(self, cmd):
            self.calls.append(cmd)
            if cmd[4] == "describe":
                return json.dumps({"state": {"state": "FAILED"}})
            return "{}"

    be = QueuedResourceBackend("proj", "z", runner=_FailFake())
    h = be.submit(["exit 1"], "bad")
    assert wait_for_job(be, h, poll_s=0.01, timeout_s=5) == JobState.FAILED
