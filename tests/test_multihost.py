"""Multi-host integration: TWO real JAX processes on localhost.

Each worker process calls ``jax.distributed.initialize`` (CPU backend),
runs ``SearchEngine.run_distributed()`` over its own byte range of a shared
file, and the all-gathered global result list must be identical on both
hosts AND identical to a single-host run — the pod-scale analog of the
reference's future harvesting + merge (``search_engine.cpp:83-102,193-197``).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER_SRC = r"""
import json
import sys

sys.path.insert(0, sys.argv[1])
import jax

jax.config.update("jax_platforms", "cpu")
coord, pid, nproc, path, semantics, mode = (
    sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), sys.argv[5],
    sys.argv[6], sys.argv[7],
)
jax.distributed.initialize(
    coordinator_address=coord, num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc

from monkey_moore_tpu.config import MatchSemantics, SearchConfig
from monkey_moore_tpu.engine import SearchEngine

cfg = SearchConfig(
    file_path=path,
    keyword="monkey",
    semantics=MatchSemantics[semantics],
    device_chunk_bytes=8192,
)
if mode == "stream":
    # force the streaming fused path (no resident corpus) on every host
    cfg.resident_bytes_limit = 0
    cfg.host_latency_threshold_bytes = 0
if mode == "mesh":
    # the full pod shape: each host scans its byte range over its OWN
    # local-device mesh (shard_map within the host, DCN gather across)
    cfg.devices = jax.local_devices()
    cfg.host_latency_threshold_bytes = 0
if mode == "abort":
    # the abort flag must be raised on EVERY host (the final gather is a
    # collective); tripping it at the first progress callback aborts each
    # host before the gather, so every host returns the empty list
    import threading

    flag = threading.Event()

    def saboteur(pct, step):
        flag.set()

    res = SearchEngine(cfg).run_distributed(
        on_progress=saboteur, abort_flag=flag
    )
else:
    res = SearchEngine(cfg).run_distributed()
out = [[r.offset, sorted(r.values_map.items())] for r in res]
print("RESULT:" + json.dumps(out), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    env = dict(os.environ)
    # one local CPU device per worker process (the virtual 8-device split is
    # for in-process mesh tests); workers force the platform via jax.config
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split() if "force_host_platform" not in f
    )
    return env


def _run_pod(tmp_path, path, n_proc, semantics, mode="normal"):
    """Launch *n_proc* real JAX worker processes; returns their RESULT
    payloads (order = process id)."""
    coord = f"127.0.0.1:{_free_port()}"
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER_SRC)
    env = _clean_env()
    if mode == "mesh":
        # 4 virtual devices per worker process (host-local mesh)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=4"
        ).strip()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(REPO), coord, str(pid),
             str(n_proc), str(path), semantics, mode],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in range(n_proc)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT:")]
        assert lines, f"no RESULT line:\n{out}\n{err}"
        outs.append(json.loads(lines[0][len("RESULT:"):]))
    return outs


def _single_host_expect(path, semantics):
    from monkey_moore_tpu.config import MatchSemantics, SearchConfig
    from monkey_moore_tpu.engine import SearchEngine

    cfg = SearchConfig(
        file_path=path,
        keyword="monkey",
        semantics=MatchSemantics[semantics],
        device_chunk_bytes=8192,
    )
    single = SearchEngine(cfg).run()
    return json.loads(
        json.dumps([[r.offset, sorted(r.values_map.items())] for r in single])
    )


@pytest.mark.parametrize("semantics", ["GREEDY", "ALL", "REFERENCE"])
def test_two_process_run_matches_single_host(tmp_path, rng, semantics):
    data = rng.integers(0, 256, 60_000).astype(np.uint8)
    enc = np.array([ord(c) + 9 for c in "monkey"], dtype=np.uint8)
    # matches in host 0's half, straddling the 30 000-byte host boundary,
    # and in host 1's half including EOF
    for pos in (5, 29_997, 45_000, 59_994):
        data[pos : pos + 6] = enc
    path = tmp_path / "pod.bin"
    path.write_bytes(data.tobytes())

    outs = _run_pod(tmp_path, path, 2, semantics)
    # both hosts return the identical global list
    assert outs[0] == outs[1]
    # and it equals the single-host run
    assert outs[0] == _single_host_expect(path, semantics)
    assert [o for o, _ in outs[0]] == [5, 29_997, 45_000, 59_994]


@pytest.mark.parametrize("semantics", ["GREEDY", "REFERENCE"])
def test_three_process_uneven_tail(tmp_path, rng, semantics):
    """3 hosts over a file whose size is NOT divisible by 3 (the last
    host's byte range is short); matches straddle BOTH host boundaries
    (at ceil(n/3) = 16 667) and sit at EOF."""
    n = 50_000  # ceil(n/3) = 16 667 -> host ranges 16 667/16 667/16 666
    data = rng.integers(0, 256, n).astype(np.uint8)
    enc = np.array([ord(c) + 9 for c in "monkey"], dtype=np.uint8)
    for pos in (5, 16_664, 33_331, n - 6):
        data[pos : pos + 6] = enc
    path = tmp_path / "pod3.bin"
    path.write_bytes(data.tobytes())

    outs = _run_pod(tmp_path, path, 3, semantics)
    assert outs[0] == outs[1] == outs[2]
    assert outs[0] == _single_host_expect(path, semantics)
    assert [o for o, _ in outs[0]] == [5, 16_664, 33_331, n - 6]


def test_two_process_streaming_path(tmp_path, rng):
    """Multi-host with residency disabled: each host streams its owned
    chunks through the pipelined fused path; the gathered global list
    must still match a single-host run."""
    data = rng.integers(0, 256, 60_000).astype(np.uint8)
    enc = np.array([ord(c) + 9 for c in "monkey"], dtype=np.uint8)
    for pos in (5, 29_997, 45_000, 59_994):
        data[pos : pos + 6] = enc
    path = tmp_path / "stream.bin"
    path.write_bytes(data.tobytes())

    outs = _run_pod(tmp_path, path, 2, "GREEDY", mode="stream")
    assert outs[0] == outs[1]
    assert outs[0] == _single_host_expect(path, "GREEDY")
    assert [o for o, _ in outs[0]] == [5, 29_997, 45_000, 59_994]


def test_two_process_mesh_per_host(tmp_path, rng):
    """The full pod shape: 2 hosts × a 4-virtual-device mesh per host.
    Each host shards its owned chunks across its local mesh (shard_map +
    ppermute halo within the host) and candidates gather over the
    process collective — identical global list on every host."""
    data = rng.integers(0, 256, 60_000).astype(np.uint8)
    enc = np.array([ord(c) + 9 for c in "monkey"], dtype=np.uint8)
    for pos in (5, 29_997, 45_000, 59_994):
        data[pos : pos + 6] = enc
    path = tmp_path / "podmesh.bin"
    path.write_bytes(data.tobytes())

    outs = _run_pod(tmp_path, path, 2, "GREEDY", mode="mesh")
    assert outs[0] == outs[1]
    assert outs[0] == _single_host_expect(path, "GREEDY")
    assert [o for o, _ in outs[0]] == [5, 29_997, 45_000, 59_994]


def test_cross_host_abort(tmp_path, rng):
    """Abort raised on every host (the documented contract): each host
    aborts before the collective gather and returns the empty list."""
    data = rng.integers(0, 256, 60_000).astype(np.uint8)
    enc = np.array([ord(c) + 9 for c in "monkey"], dtype=np.uint8)
    data[100:106] = enc
    path = tmp_path / "abort.bin"
    path.write_bytes(data.tobytes())

    outs = _run_pod(tmp_path, path, 2, "GREEDY", mode="abort")
    assert outs[0] == outs[1] == []
