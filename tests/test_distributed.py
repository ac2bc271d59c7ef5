"""Multi-process jax.distributed bring-up tests (SURVEY.md §4: "multi-process
DCN paths tested with jax.distributed local multi-process runs").

Launches two REAL local processes on the CPU backend through
``aero_gnn_tpu.parallel.distributed.initialize`` and runs a cross-process
psum (XLA:CPU Gloo collectives). Everything runs in subprocesses so the
pytest process's JAX state is untouched.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, %r)
    from aero_gnn_tpu.parallel import distributed
    distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid,
                           initialization_timeout=120)
    assert jax.process_count() == 2, jax.process_count()
    assert distributed.is_primary() == (pid == 0)
    import jax.numpy as jnp
    out = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
        jnp.array([float(pid + 1)]))
    val = float(out[0])
    assert val == 3.0, val
    print(f"proc{pid}: psum={val}", flush=True)
""" % REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]

def _clean_env() -> dict:
    env = dict(os.environ)
    # do not inherit the pytest session's virtual-device / platform pins
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env

def test_two_process_psum():
    port = _free_port()
    env = _clean_env()
    procs = [
        subprocess.Popen([sys.executable, "-u", "-c", _WORKER, str(i),
                          str(port)], env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i}: psum=3.0" in out, out

def test_explicit_bad_coordinator_raises(monkeypatch):
    # An EXPLICIT cluster spec whose bring-up fails must raise — silently
    # degrading to single-process would psum over one host and train on a
    # fraction of the data without a word. (Real network failures abort in
    # the XLA C++ coordination client before Python sees them, so the
    # wrapper's propagate-vs-swallow logic is tested by stubbing the
    # underlying call; the genuine bring-up path is covered by
    # test_two_process_psum.)
    import jax

    from aero_gnn_tpu.parallel import distributed

    def boom(**kwargs):
        raise RuntimeError("bind failed")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="bind failed"):
        distributed.initialize(coordinator_address="10.0.0.1:1234",
                               num_processes=2, process_id=0)
    with pytest.raises(RuntimeError, match="bind failed"):
        distributed.initialize(num_processes=2, process_id=0)
    # auto-detect path (no explicit spec) still degrades gracefully
    distributed.initialize()
    # re-initialization stays idempotent
    def already(**kwargs):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", already)
    distributed.initialize(coordinator_address="10.0.0.1:1234",
                           num_processes=2, process_id=0)

def test_single_process_noop():
    # num_processes=1 must be a no-op even with a bogus coordinator
    from aero_gnn_tpu.parallel import distributed
    distributed.initialize(coordinator_address="127.0.0.1:9",
                           num_processes=1)
