import jax
import numpy as np
import pytest

from svdss_tpu.index.fmd import build_index
from svdss_tpu.ops.fmd_jax import DeviceFMDIndex
from svdss_tpu.ops.pingpong_host import ping_pong_search
from svdss_tpu.ops.pingpong_jax import pack_reads
from svdss_tpu.parallel.mesh import (make_mesh, merge_shard_results,
                                     sharded_batch_search)
from svdss_tpu.utils.seq import encode_nt6


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(55)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = {"g": bases[rng.integers(0, 4, 3000)].tobytes().decode()}
    index = build_index(genome)
    g = genome["g"]
    reads = []
    for _ in range(16):
        ln = int(rng.integers(150, 400))
        p = int(rng.integers(0, len(g) - ln))
        read = list(g[p:p + ln])
        for _ in range(3):
            read[int(rng.integers(0, ln))] = "ACGT"[int(rng.integers(0, 4))]
        reads.append(encode_nt6("".join(read)))
    return index, reads


def test_eight_device_mesh_matches_host(problem):
    index, reads = problem
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(8)
    dev_index = DeviceFMDIndex.from_host(index)
    seqs, lens = pack_reads(reads)
    result = sharded_batch_search(mesh, dev_index, seqs, lens, cap=64)
    merged = merge_shard_results(result, len(reads))
    for i, enc in enumerate(reads):
        assert merged[i] == ping_pong_search(index, enc), i


def test_mesh_sizes_agree(problem):
    """Results must be identical at any mesh size (deterministic merge)."""
    index, reads = problem
    dev_index = DeviceFMDIndex.from_host(index)
    seqs, lens = pack_reads(reads)
    out = {}
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        res = sharded_batch_search(mesh, dev_index, seqs, lens, cap=64)
        out[n] = merge_shard_results(res, len(reads))
    assert out[1] == out[2] == out[4] == out[8]


def test_anchor_engine_mesh_matches_host():
    # the production anchor engine over device meshes == host oracle,
    # identical at every mesh size (the FM tests above cover the FM path)
    from svdss_tpu.index.fmd import genome_text
    from svdss_tpu.ops.anchor import build_anchor_index
    from svdss_tpu.ops.anchor_jax import build_device_anchor
    from svdss_tpu.parallel.mesh import sharded_batch_search_anchor
    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = {"g": bases[rng.integers(0, 4, 5000)].tobytes().decode()}
    index = build_index(genome)
    aidx = build_anchor_index(genome_text(genome), k=8)
    didx, params = build_device_anchor(aidx)
    g = genome["g"]
    reads = []
    for _ in range(16):
        ln = int(rng.integers(150, 400))
        p = int(rng.integers(0, len(g) - ln))
        read = list(g[p:p + ln])
        for _ in range(3):
            read[int(rng.integers(0, ln))] = "ACGT"[int(rng.integers(0, 4))]
        reads.append(encode_nt6("".join(read)))
    seqs, lens = pack_reads(reads)
    out = {}
    for n_dev in (1, 2, 8):
        mesh = make_mesh(n_dev)
        res = sharded_batch_search_anchor(mesh, didx, params, seqs, lens,
                                          cap=64)
        bad = np.asarray(res.incomplete | res.overflow)
        merged = merge_shard_results(res, len(reads))
        out[n_dev] = merged
        for i, enc in enumerate(reads):
            if bad[i]:
                continue
            assert merged[i] == ping_pong_search(index, enc), (n_dev, i)
    assert out[1] == out[2] == out[8]


def test_anchor_wide_engine_mesh_matches_host():
    # the whole-genome wide anchor engine over device meshes == host
    # oracle, identical at every mesh size
    from svdss_tpu.index.fmd import genome_text
    from svdss_tpu.ops.anchor_wide import build_anchor_index_wide
    from svdss_tpu.ops.anchor_wide_jax import build_device_anchor_wide
    from svdss_tpu.parallel.mesh import sharded_batch_search_anchor_wide

    from test_anchor_wide import _fwd_text, _mk_genome, _reads
    rng = np.random.default_rng(31)
    chroms = {"c1": _mk_genome(rng, 40_000), "c2": _mk_genome(rng, 20_000)}
    index = build_index(chroms)
    widx = build_anchor_index_wide(_fwd_text(chroms), k=10, cmax=24)
    didx, params = build_device_anchor_wide(widx)
    encs = _reads(rng, chroms, 16, 500)
    seqs, lens = pack_reads(encs)
    out = {}
    n_resolved = 0
    for n_dev in (1, 2, 8):
        mesh = make_mesh(n_dev)
        res = sharded_batch_search_anchor_wide(mesh, didx, params, seqs,
                                               lens, cap=64)
        bad = np.asarray(res.incomplete | res.overflow)
        merged = merge_shard_results(res, len(encs))
        out[n_dev] = merged
        for i, enc in enumerate(encs):
            if bad[i]:
                continue
            n_resolved += 1
            assert merged[i] == ping_pong_search(index, enc), (n_dev, i)
    assert out[1] == out[2] == out[8]
    assert n_resolved >= 3 * len(encs) // 2   # most lanes device-resolve


def test_anchor_wide_parked_waves_mesh_matches_oracle():
    """Sharded parked-phase waves: a repeat-rich genome whose heavy
    anchors would storm the one-shot sharded path must stay resident
    and bit-exact on a mesh, identical at every mesh size and to the
    single-device wave driver."""
    from svdss_tpu.ops.anchor_wide import (anchor_search_wide,
                                           build_anchor_index_wide,
                                           make_heavy_resolver)
    from svdss_tpu.ops.anchor_wide_jax import build_device_anchor_wide
    from svdss_tpu.parallel.mesh import \
        sharded_batch_search_anchor_wide_waves

    from test_anchor_wide import _fwd_text, _mk_genome, _reads
    rng = np.random.default_rng(67)
    unit = _mk_genome(rng, 500)
    parts = [_mk_genome(rng, 2_000)]
    for _ in range(30):
        c = list(unit)
        for _ in range(len(c) // 20):
            c[rng.integers(0, len(c))] = "ACGT"[rng.integers(0, 4)]
        parts.append("".join(c))
        parts.append(_mk_genome(rng, 600))
    chroms = {"r": "".join(parts)}
    widx = build_anchor_index_wide(_fwd_text(chroms), k=9, cmax=12)
    assert widx.heavy_rate > 0.1
    resolver = make_heavy_resolver(widx)
    didx, params = build_device_anchor_wide(widx)
    encs = _reads(rng, chroms, 16, 800)
    seqs, lens = pack_reads(encs)

    def resolve_phases(lanes, ancs, dirbs):
        out = np.empty(len(lanes), dtype=np.int32)
        for j, (ln, a, d) in enumerate(zip(lanes, ancs, dirbs)):
            out[j] = resolver(encs[ln], int(a),
                              "left" if d == 1 else "right")
        return out

    out = {}
    for n_dev in (1, 2, 8):
        mesh = make_mesh(n_dev)
        res = sharded_batch_search_anchor_wide_waves(
            mesh, didx, params, seqs, lens, resolve_phases, cap=64)
        bad = np.asarray(res.incomplete | res.overflow)
        merged = merge_shard_results(res, len(encs))
        out[n_dev] = merged
        # parking keeps most lanes live even on the sharded path
        assert bad[:len(encs)].sum() <= len(encs) // 4
        for i, enc in enumerate(encs):
            if bad[i]:
                continue
            assert merged[i] == anchor_search_wide(
                widx, enc, resolver=resolver), (n_dev, i)
    assert out[1] == out[2] == out[8]
