"""Failure-detection / elastic-recovery primitives (utils.resilience)."""

import numpy as np
import pytest

from raytracing_tpu.utils import checkpoint as ckpt
from raytracing_tpu.utils.resilience import (
    DeviceLost,
    Supervisor,
    device_alive,
    is_transient,
    with_retry,
)


def test_device_alive_cpu():
    assert device_alive(timeout_s=60.0)


def test_is_transient_classification():
    assert is_transient(RuntimeError("UNAVAILABLE: device disconnected"))
    assert is_transient(OSError("transport closed"))
    assert not is_transient(ValueError("bad shape"))
    assert not is_transient(RuntimeError("some unrelated assertion"))


def test_with_retry_recovers_after_transient_faults():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("UNAVAILABLE: device rebooting")
        return "ok"

    assert with_retry(flaky, retries=3, backoff_s=0.0) == "ok"
    assert len(calls) == 3


def test_with_retry_propagates_deterministic_errors():
    def broken():
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        with_retry(broken, retries=5, backoff_s=0.0)


def test_with_retry_raises_device_lost_when_exhausted():
    def dead():
        raise RuntimeError("UNAVAILABLE: gone")

    with pytest.raises(DeviceLost) as ei:
        with_retry(dead, retries=2, backoff_s=0.0)
    assert isinstance(ei.value.last_error, RuntimeError)


def test_supervisor_checkpoints_on_device_loss(tmp_path):
    path = str(tmp_path / "recover.npz")
    state = {"params": {"x": np.arange(3.0)}, "opt_state": None}
    sup = Supervisor(path, state_fn=lambda: state, retries=1, backoff_s=0.0)

    sup.run_step(lambda: 1.0)  # healthy step
    state["params"]["x"] = np.arange(3.0) + 7  # progress before the fault

    def dead():
        raise RuntimeError("UNAVAILABLE: device lost")

    with pytest.raises(DeviceLost) as ei:
        sup.run_step(dead)
    assert ei.value.checkpoint_path == path
    params, _, step, _ = ckpt.load(path, state["params"])
    assert step == 1  # one completed step before loss
    np.testing.assert_array_equal(np.asarray(params["x"]), np.arange(3.0) + 7)


def test_supervisor_periodic_checkpoint(tmp_path):
    path = str(tmp_path / "periodic.npz")
    state = {"params": {"x": np.zeros(2)}}
    sup = Supervisor(path, state_fn=lambda: state, checkpoint_every=2)
    sup.run_step(lambda: None)
    sup.run_step(lambda: None)
    params, _, step, _ = ckpt.load(path, state["params"])
    assert step == 2
