"""Fuzz the Python oracle against the compiled reference binary.

Usage: python tools/refcheck/crosscheck.py [SEED]
(default seed 1234 — pass fresh seeds for additional independent sweeps)
"""
import subprocess
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
from monkey_moore_tpu.oracle import OracleSearcher

REF = "/tmp/refcheck/refsearch"
SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 1234
rng = np.random.default_rng(SEED)


def run_ref(mode, width, kw_cps, wc, seq_cps, vals, data_bytes):
    with open("/tmp/refcheck/data.bin", "wb") as f:
        f.write(data_bytes)
    out = subprocess.run(
        [REF, mode, str(width),
         " ".join(map(str, kw_cps)), str(wc) if wc else "",
         " ".join(map(str, seq_cps)), " ".join(map(str, vals)),
         "/tmp/refcheck/data.bin"],
        capture_output=True, text=True, timeout=60)
    results = []
    for line in out.stdout.splitlines():
        if line.startswith("EXC"):
            return "EXC"
        off, _, rest = line.partition(":")
        m = {}
        for kv in rest.split():
            k, v = kv.split("=")
            m[int(k)] = int(v)
        results.append((int(off), m))
    return results


def oracle(mode, width, kw_cps, wc, seq_cps, vals, data_bytes):
    dtype = np.uint8 if width == 1 else np.uint16
    data = np.frombuffer(data_bytes, dtype=dtype)
    try:
        if mode == "value":
            s = OracleSearcher(reference_values=vals, dtype=dtype)
        else:
            s = OracleSearcher(list(kw_cps), wc or 0, list(seq_cps), dtype=dtype)
        return [(o, {int(k): int(v) for k, v in m.items()}) for o, m in s.search(data)]
    except Exception as e:
        return "EXC"


def check(tag, mode, width, kw_cps, wc, seq_cps, vals, data_bytes):
    r = run_ref(mode, width, kw_cps, wc, seq_cps, vals, data_bytes)
    o = oracle(mode, width, kw_cps, wc, seq_cps, vals, data_bytes)
    if r != o:
        print(f"MISMATCH [{tag}] kw={kw_cps} wc={wc} seq={seq_cps} vals={vals}")
        print("  ref:", r if r == "EXC" else r[:8], "..." if r != "EXC" and len(r) > 8 else "")
        print("  orc:", o if o == "EXC" else o[:8], "..." if o != "EXC" and len(o) > 8 else "")
        return False
    return True



def degenerate(kwl, wc, seq=(), width=1):
    # advance <= 0 → reference hangs (uses the repo compiler, which also
    # applies mixed-case auto-wildcarding)
    from monkey_moore_tpu.pattern import compile_pattern, PatternError
    dtype = np.uint8 if width == 1 else np.uint16
    try:
        pat = compile_pattern(kwl, wc, list(seq), dtype=dtype)
    except PatternError:
        return False  # both sides raise; comparable
    return pat.advance <= 0

fails = 0
trials = 0

# --- plain ascii keywords over shifted-text-like data, u8 and u16
letters = np.arange(97, 123)
for t in range(300):
    width = int(rng.choice([1, 2]))
    n = int(rng.integers(10, 2000))
    # data: mix of random bytes and planted shifted text
    data = rng.integers(0, 256 if width == 1 else 65536, n)
    kw_len = int(rng.integers(2, 9))
    kw = rng.choice(letters, kw_len)
    # plant shifted copies
    for _ in range(int(rng.integers(0, 4))):
        pos = int(rng.integers(0, max(1, n - kw_len)))
        shift = int(rng.integers(-30, 30))
        data[pos:pos + kw_len] = (kw + shift) % (256 if width == 1 else 65536)
    dtype = np.uint8 if width == 1 else np.uint16
    db = data.astype(dtype).tobytes()
    trials += 1
    fails += not check("ascii", "simple", width, kw.tolist(), 0, [], [], db)

# --- wildcard + mixed case
for t in range(300):
    width = int(rng.choice([1, 2]))
    n = int(rng.integers(10, 1500))
    data = rng.integers(0, 256 if width == 1 else 65536, n)
    kw_len = int(rng.integers(2, 9))
    kw = rng.choice(letters, kw_len)
    # random upcase some, random wildcards
    for i in range(kw_len):
        if rng.random() < 0.3:
            kw[i] -= 32  # upper
    wc = 42  # '*'
    kwl = kw.tolist()
    for i in range(kw_len):
        if rng.random() < 0.25:
            kwl[i] = wc
    for _ in range(int(rng.integers(0, 4))):
        pos = int(rng.integers(0, max(1, n - kw_len)))
        shift = int(rng.integers(-30, 30))
        data[pos:pos + kw_len] = (np.array(kwl) + shift) % (256 if width == 1 else 65536)
    dtype = np.uint8 if width == 1 else np.uint16
    db = data.astype(dtype).tobytes()
    if degenerate(kwl, wc, (), width):
        continue
    trials += 1
    fails += not check("wc", "simple", width, kwl, wc, [], [], db)

# --- custom sequences (with and without wildcards)
for t in range(200):
    width = int(rng.choice([1, 2]))
    n = int(rng.integers(10, 1000))
    seq_len = int(rng.integers(5, 30))
    seq = rng.choice(np.arange(0x3042, 0x3042 + 80), seq_len, replace=False)
    kw_len = int(rng.integers(2, min(9, seq_len + 1)))
    kw = rng.choice(seq, kw_len).tolist()
    use_wc = rng.random() < 0.5
    wc = 42 if use_wc else 0
    if use_wc:
        for i in range(kw_len):
            if rng.random() < 0.25:
                kw[i] = wc
    data = rng.integers(0, 256 if width == 1 else 65536, n)
    dtype = np.uint8 if width == 1 else np.uint16
    # plant index-encoded keyword
    idx = {c: i for i, c in enumerate(seq.tolist())}
    for _ in range(int(rng.integers(0, 4))):
        pos = int(rng.integers(0, max(1, n - kw_len)))
        shift = int(rng.integers(0, 40))
        enc = [(idx.get(c, 0) + shift) for c in kw]
        data[pos:pos + kw_len] = np.array(enc) % (256 if width == 1 else 65536)
    db = data.astype(dtype).tobytes()
    if use_wc and degenerate(kw, wc, seq.tolist(), width):
        continue
    trials += 1
    fails += not check("seq", "simple", width, kw, wc, seq.tolist(), [], db)

# --- value scan
for t in range(150):
    width = int(rng.choice([1, 2]))
    n = int(rng.integers(10, 1000))
    vlen = int(rng.integers(2, 8))
    vals = rng.integers(0, 200, vlen).tolist()
    data = rng.integers(0, 256 if width == 1 else 65536, n)
    for _ in range(int(rng.integers(0, 4))):
        pos = int(rng.integers(0, max(1, n - vlen)))
        shift = int(rng.integers(0, 50))
        data[pos:pos + vlen] = (np.array(vals) + shift) % (256 if width == 1 else 65536)
    dtype = np.uint8 if width == 1 else np.uint16
    db = data.astype(dtype).tobytes()
    trials += 1
    fails += not check("value", "value", width, [], 0, [], vals, db)

# --- periodic/pathological patterns
for t in range(100):
    width = 1
    n = int(rng.integers(10, 300))
    kw_len = int(rng.integers(2, 6))
    kw = rng.choice(letters[:3], kw_len)  # tiny alphabet → periodic
    data = rng.choice(np.arange(97, 101), n)
    db = data.astype(np.uint8).tobytes()
    trials += 1
    fails += not check("periodic", "simple", width, kw.tolist(), 0, [], [], db)

print(f"{trials} trials, {fails} mismatches (seed {SEED})")
sys.exit(1 if fails else 0)
