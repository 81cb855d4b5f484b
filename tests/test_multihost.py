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
coord, pid, path, semantics = sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5]
jax.distributed.initialize(
    coordinator_address=coord, num_processes=2, process_id=pid
)
assert jax.process_count() == 2

from monkey_moore_tpu.config import MatchSemantics, SearchConfig
from monkey_moore_tpu.engine import SearchEngine

cfg = SearchConfig(
    file_path=path,
    keyword="monkey",
    semantics=MatchSemantics[semantics],
    device_chunk_bytes=8192,
)
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

    coord = f"127.0.0.1:{_free_port()}"
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER_SRC)
    env = _clean_env()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(REPO), coord, str(pid),
             str(path), semantics],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT:")]
        assert lines, f"no RESULT line:\n{out}\n{err}"
        outs.append(json.loads(lines[0][len("RESULT:"):]))

    # both hosts return the identical global list
    assert outs[0] == outs[1]

    # and it equals the single-host run
    from monkey_moore_tpu.config import MatchSemantics, SearchConfig
    from monkey_moore_tpu.engine import SearchEngine

    cfg = SearchConfig(
        file_path=path,
        keyword="monkey",
        semantics=MatchSemantics[semantics],
        device_chunk_bytes=8192,
    )
    single = SearchEngine(cfg).run()
    expect = json.loads(
        json.dumps([[r.offset, sorted(r.values_map.items())] for r in single])
    )
    assert outs[0] == expect
    assert [o for o, _ in outs[0]] == [5, 29_997, 45_000, 59_994]
