"""Format-level fuzz of the native LMDB engine (native/teio.cpp).

The roundtrip tests in test_native_io.py prove the engine reads what
our writer emits; this file attacks the engine with the FORMAT — the
published on-disk layout — rather than the writer's habits:

  * **geometry properties**: key/value sizes straddling the
    inline/overflow node boundary, overflow values straddling page
    boundaries, max-fill leaves, deep branch chains (depth >= 4),
    degenerate shapes (empty value, 1-byte key, near-page-size key) —
    every key must read back byte-exact and lexicographic neighbours
    must miss cleanly;
  * **byte-level mutations**: truncation at every structural offset,
    every node-pointer slot of every tree page overwritten with
    adversarial offsets, meta-field corruption (root / depth / entries
    / last_pg), and random byte flips over the whole file — every
    lookup must return a clean rc (found / -1 / -2 / -3), never crash
    or overread;
  * **loader lifecycle on corrupt files**: ``teio_loader_create`` on
    mutants either fails creation or creates a loader whose destructor
    terminates (regression for the corrupt-record retry loop spinning
    past ``stop`` and hanging the join).

Everything runs in ONE subprocess against a dedicated
AddressSanitizer build of the engine, so overreads that happen to
land in mapped memory still abort the run.  A crash/hang anywhere
fails via returncode/timeout.

Reference behaviour being mirrored: the Python ``lmdb`` binding
raises MDB_CORRUPTED on malformed files (the reference's dataset
layer, utils/dataset.py:9-45, inherits that); our engine returns
negative rcs instead of faulting.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "native", "teio.cpp")


def _build_asan(tmp: str) -> str:
    so = os.path.join(tmp, "libteio_asan.so")
    subprocess.run(
        ["g++", "-O1", "-g", "-fsanitize=address", "-shared", "-fPIC",
         "-std=c++17", SRC, "-o", so, "-ljpeg", "-lpthread"],
        check=True, capture_output=True)
    return so


def _libasan() -> str:
    out = subprocess.run(["g++", "-print-file-name=libasan.so"],
                         capture_output=True, text=True, check=True)
    path = out.stdout.strip()
    if not path or not os.path.exists(os.path.realpath(path)):
        pytest.skip("libasan not available")
    return path


DRIVER = r"""
import ctypes, os, random, sys

SO = os.environ["TEIO_SO"]
sys.path.insert(0, os.environ["REPO"])
WORK = os.environ["WORK"]

from transeditor_tpu.data.lmdb_writer import (MAX_NODE, PSIZE, write_lmdb)

lib = ctypes.CDLL(SO)
lib.teio_lmdb_open.restype = ctypes.c_void_p
lib.teio_lmdb_open.argtypes = [ctypes.c_char_p]
lib.teio_lmdb_close.argtypes = [ctypes.c_void_p]
lib.teio_lmdb_get.restype = ctypes.c_long
lib.teio_lmdb_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                              ctypes.c_long, ctypes.c_char_p, ctypes.c_long]
lib.teio_loader_create.restype = ctypes.c_void_p
lib.teio_loader_create.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_uint64, ctypes.c_int, ctypes.c_long, ctypes.c_long,
    ctypes.c_int]
lib.teio_loader_destroy.argtypes = [ctypes.c_void_p]

CAP = 1 << 20
BUF = ctypes.create_string_buffer(CAP)


def get(env, key):
    n = lib.teio_lmdb_get(env, key, len(key), BUF, CAP)
    if n < 0:
        return None if n == -1 else ("rc", n)
    assert n <= CAP, (key, n)
    return BUF.raw[:n]


def mkdb(name, items):
    path = os.path.join(WORK, name)
    write_lmdb(path, items)
    return path


def check_exact(path, items, probes=None):
    env = lib.teio_lmdb_open(path.encode())
    assert env, path
    try:
        for k, v in items.items():
            got = get(env, k)
            assert got == v, (path, k, type(got), got if got is None
                              else len(got) if isinstance(got, bytes)
                              else got)
        for k in (probes or []):
            got = get(env, k)
            assert got is None or isinstance(got, tuple), (path, k)
    finally:
        lib.teio_lmdb_close(env)


def neighbours(keys):
    out = [b"", b"\x00", b"\xff" * 8]
    for k in list(keys)[:20]:
        out += [k + b"\x00", k[:-1], k[:-1] + bytes([k[-1] ^ 1])]
    return [p for p in out if p not in keys]


# ---------------------------------------------------------------- geometry
print("geometry...", flush=True)

# 1) inline/overflow node-size boundary (writer: node = 8+klen+vlen,
#    > MAX_NODE goes to overflow pages)
k = b"boundary-key"
for i, delta in enumerate((-2, -1, 0, 1, 2)):
    size = MAX_NODE - 8 - len(k) + delta
    items = {k: bytes((j * 7 + i) & 0xFF for j in range(size)),
             b"a-second": b"x"}
    check_exact(mkdb(f"geom_node_{i}", items), items, neighbours(items))

# 2) overflow values straddling page boundaries (data area of an
#    overflow run is n*PSIZE-16 bytes)
for n in (1, 2, 3):
    for j, delta in enumerate((-1, 0, 1)):
        size = n * PSIZE - 16 + delta
        items = {b"ovf": bytes((i * 13) & 0xFF for i in range(size))}
        check_exact(mkdb(f"geom_ovf_{n}_{j}", items), items,
                    neighbours(items))

# 3) max-fill leaves: nodes sized to pack pages to the brim
items = {}
rnd = random.Random(3)
for i in range(400):
    vlen = rnd.choice([1, 17, 100, 497, 498, 499, 500, 1000,
                       MAX_NODE - 8 - 9])
    items[b"%08d" % i] = bytes(rnd.getrandbits(8) for _ in range(vlen))
check_exact(mkdb("geom_fill", items), items, neighbours(items))

# 4) deep branch chain: fat keys -> few nodes/page -> depth >= 4
items = {(b"%05d" % i) + b"k" * 295: b"v%d" % i for i in range(3000)}
check_exact(mkdb("geom_deep", items), items, neighbours(items))

# 5) degenerate shapes
for i, items in enumerate([
        {b"k": b""},                                   # empty value
        {b"x": b"y"},                                  # single tiny pair
        {bytes([65 + j]): b"v" * j for j in range(26)},  # 1-byte keys
        {b"K" * (MAX_NODE - 8 - 1): b"v"},             # near-max key
]):
    check_exact(mkdb(f"geom_degen_{i}", items), items, neighbours(items))

# ---------------------------------------------------------------- mutations
print("mutations...", flush=True)

base_items = {b"%05d" % i: b"val" * (i % 37 + 1) for i in range(150)}
base_items[b"big-one"] = bytes(range(256)) * 40        # overflow record
base_items[b"length"] = b"150"
base = mkdb("mut_base", base_items)
blob = open(os.path.join(base, "data.mdb"), "rb").read()
scan_keys = list(base_items)[::5] + [b"big-one", b"length"]
probe_keys = neighbours(base_items)

mdir = os.path.join(WORK, "mutants")
os.makedirs(mdir, exist_ok=True)
mut_file = os.path.join(mdir, "data.mdb")


def scan_mutant(tag):
    env = lib.teio_lmdb_open(mdir.encode())
    if not env:
        return  # rejecting the env outright is always fine
    try:
        for k in scan_keys + probe_keys:
            r = get(env, k)
            if isinstance(r, bytes):
                assert len(r) <= CAP
    finally:
        lib.teio_lmdb_close(env)


n_cases = 0

# truncation at every structural offset: page starts, page-header
# boundaries, node-array region, and the file tail byte-by-byte
truncs = set()
for pg in range(0, len(blob) // PSIZE + 1):
    for off in (0, 1, 15, 16, 17, 96, 97):
        truncs.add(pg * PSIZE + off)
truncs |= set(range(0, 3 * PSIZE, 256))
truncs |= {len(blob) - d for d in range(1, 33)}
for t in sorted(x for x in truncs if 0 <= x < len(blob)):
    with open(mut_file, "wb") as f:
        f.write(blob[:t])
    scan_mutant(f"trunc@{t}")
    n_cases += 1

# every node-pointer slot of every tree page, overwritten with
# adversarial in-page/out-of-page offsets
ADVERSE = (0, 1, 15, 16, PSIZE - 1, PSIZE - 8, PSIZE, 0xFFFF)
npages = len(blob) // PSIZE
for pg in range(2, npages):
    hdr_flags = int.from_bytes(blob[pg * PSIZE + 10:pg * PSIZE + 12],
                               "little")
    if not (hdr_flags & 0x03):       # only branch/leaf pages have slots
        continue
    lower = int.from_bytes(blob[pg * PSIZE + 12:pg * PSIZE + 14], "little")
    nslots = max(0, (lower - 16) // 2)
    for slot in range(min(nslots, 30)):
        off = pg * PSIZE + 16 + 2 * slot
        for val in ADVERSE:
            bad = bytearray(blob)
            bad[off:off + 2] = int(val).to_bytes(2, "little")
            with open(mut_file, "wb") as f:
                f.write(bad)
            scan_mutant(f"slot pg={pg} s={slot} v={val}")
            n_cases += 1

# meta-field corruption: root / depth / entries / last_pg / mapsize,
# in one or both meta pages
META_FIELDS = {          # offset within the meta struct (after PageHdr)
    "mapsize": 16, "freedb": 24, "maindb_depth": 24 + 48 + 6,
    "maindb_entries": 24 + 48 + 32, "maindb_root": 24 + 48 + 40,
    "last_pg": 24 + 96,
}
HUGE = (0, 1, 2, 2**31, 2**40, 2**63, 2**64 - 1)
for fname, foff in META_FIELDS.items():
    for val in HUGE:
        for metas in ((0,), (0, 1)):
            bad = bytearray(blob)
            for m in metas:
                o = m * PSIZE + 16 + foff
                bad[o:o + 8] = int(val).to_bytes(8, "little")
            with open(mut_file, "wb") as f:
                f.write(bad)
            scan_mutant(f"meta {fname}={val} metas={metas}")
            n_cases += 1

# random byte flips across the whole file
rnd = random.Random(0xC0DE)
for trial in range(300):
    bad = bytearray(blob)
    for _ in range(rnd.randint(1, 8)):
        bad[rnd.randrange(len(bad))] ^= 1 << rnd.randrange(8)
    with open(mut_file, "wb") as f:
        f.write(bad)
    scan_mutant(f"flip#{trial}")
    n_cases += 1

print(f"mutation cases: {n_cases}", flush=True)

# ------------------------------------------------- loader lifecycle
# creation on corrupt files must fail cleanly OR create a loader whose
# destructor terminates (the retry loop must observe `stop` even when
# EVERY record is corrupt — otherwise this join hangs and the test
# times out)
print("loader lifecycle...", flush=True)
lc = 0
for trial in range(12):
    bad = bytearray(blob)
    for _ in range(rnd.randint(4, 64)):
        bad[rnd.randrange(len(bad))] ^= 0xFF
    with open(mut_file, "wb") as f:
        f.write(bad)
    L = lib.teio_loader_create(mdir.encode(), 8, 4, 2, trial, 1, 0, 1, 2)
    if L:
        lib.teio_loader_destroy(L)
        lc += 1
# the all-records-corrupt-but-readable case, explicitly: valid tree,
# every value is garbage JPEG
garbage = {b"8-%05d" % i: b"not a jpeg %d" % i for i in range(8)}
garbage[b"length"] = b"8"
gpath = mkdb("all_corrupt", garbage)
L = lib.teio_loader_create(gpath.encode(), 8, 4, 2, 0, 1, 0, 1, 2)
assert L, "valid tree with corrupt records must still create"
import time
time.sleep(0.3)                     # let workers enter the retry spin
lib.teio_loader_destroy(L)          # must terminate, not hang the join
print(f"loader create survived: {lc}/12 + all-corrupt destroy OK",
      flush=True)

print("FUZZ_OK", flush=True)
"""


@pytest.mark.slow
def test_lmdb_format_fuzz(tmp_path):
    so = _build_asan(str(tmp_path))
    env = dict(
        os.environ,
        REPO=REPO,
        TEIO_SO=so,
        WORK=str(tmp_path / "work"),
        LD_PRELOAD=_libasan(),
        ASAN_OPTIONS="detect_leaks=0:abort_on_error=1:"
                     "allocator_may_return_null=1",
        JAX_PLATFORMS="cpu",
    )
    os.makedirs(env["WORK"], exist_ok=True)
    p = subprocess.run([sys.executable, "-c", DRIVER], env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True, timeout=900)
    assert p.returncode == 0, p.stdout[-8000:]
    assert "FUZZ_OK" in p.stdout, p.stdout[-8000:]
