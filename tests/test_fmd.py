import numpy as np
import pytest

from svdss_tpu.index.fmd import FMDIndex, build_index, genome_text
from svdss_tpu.index.suffix_array import suffix_array_doubling
from svdss_tpu.utils.seq import encode_nt6, decode_nt6, revcomp_str


def naive_count(chroms, pattern: str) -> int:
    """Occurrences of pattern over both strands (overlapping)."""
    total = 0
    for seq in chroms.values():
        for strand in (seq, revcomp_str(seq)):
            start = 0
            while True:
                i = strand.find(pattern, start)
                if i < 0:
                    break
                total += 1
                start = i + 1
    return total


@pytest.fixture(scope="module")
def small_genome():
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    chroms = {
        "c1": bases[rng.integers(0, 4, 3000)].tobytes().decode(),
        "c2": bases[rng.integers(0, 4, 1500)].tobytes().decode(),
    }
    return chroms


@pytest.fixture(scope="module")
def small_index(small_genome):
    return build_index(small_genome)


def test_suffix_array_doubling():
    t = encode_nt6("GATTACAGATTACA")
    sa = suffix_array_doubling(t)
    sufs = [decode_nt6(t[i:]) for i in sa]
    assert sufs == sorted(sufs)


def test_counts_match_naive(small_genome, small_index, rng):
    chroms, idx = small_genome, small_index
    seq_all = chroms["c1"]
    # patterns sampled from the genome (present) and random (mostly absent)
    for _ in range(60):
        ln = int(rng.integers(1, 20))
        p = int(rng.integers(0, len(seq_all) - ln))
        pat = seq_all[p:p + ln]
        assert idx.count_occurrences(encode_nt6(pat)) == \
            naive_count(chroms, pat), pat
    bases = "ACGT"
    for _ in range(60):
        ln = int(rng.integers(1, 12))
        pat = "".join(bases[i] for i in rng.integers(0, 4, ln))
        assert idx.count_occurrences(encode_nt6(pat)) == \
            naive_count(chroms, pat), pat


def test_forward_extension(small_genome, small_index, rng):
    """Forward extension W -> W+a must count like backward on the full string."""
    from svdss_tpu.utils.seq import COMP6
    chroms, idx = small_genome, small_index
    seq = chroms["c2"]
    for _ in range(40):
        ln = int(rng.integers(2, 15))
        p = int(rng.integers(0, len(seq) - ln))
        pat = encode_nt6(seq[p:p + ln])
        # build interval forward from pat[0]
        ik = idx.set_intv(int(pat[0]))
        for a in pat[1:]:
            ok = idx.extend(ik, False)
            ik = ok[int(COMP6[a])]
        assert ik.size == naive_count(chroms, seq[p:p + ln])


def test_bi_interval_symmetry(small_genome, small_index, rng):
    """x1 of interval(W) is x0 of interval(revcomp(W))."""
    chroms, idx = small_genome, small_index
    seq = chroms["c1"]
    for _ in range(25):
        ln = int(rng.integers(2, 10))
        p = int(rng.integers(0, len(seq) - ln))
        pat = seq[p:p + ln]
        rc = revcomp_str(pat)
        ik = idx.set_intv(int(encode_nt6(pat)[-1]))
        for c in encode_nt6(pat)[-2::-1]:
            ik = idx.extend(ik, True)[int(c)]
        ik_rc = idx.set_intv(int(encode_nt6(rc)[-1]))
        for c in encode_nt6(rc)[-2::-1]:
            ik_rc = idx.extend(ik_rc, True)[int(c)]
        assert ik.size == ik_rc.size
        assert ik.x1 == ik_rc.x0
        assert ik.x0 == ik_rc.x1


def test_rank_vectorized(small_index, rng):
    idx = small_index
    bwt = idx.bwt_symbols()
    pos = rng.integers(0, idx.n + 1, 50)
    ranks = idx.rank6(pos)
    for p, row in zip(pos, ranks):
        expect = np.bincount(bwt[:p], minlength=8)[:6]
        assert np.array_equal(row, expect)


def test_save_load(tmp_path, small_genome, small_index):
    p = tmp_path / "idx"
    small_index.save(str(p))
    idx2 = FMDIndex.load(str(p))
    assert idx2.n == small_index.n
    assert np.array_equal(idx2.C, small_index.C)
    pat = encode_nt6(small_genome["c1"][100:115])
    assert idx2.count_occurrences(pat) == small_index.count_occurrences(pat)


def test_genome_text_layout(small_genome):
    t = genome_text(small_genome)
    n1, n2 = len(small_genome["c1"]), len(small_genome["c2"])
    assert len(t) == 2 * (n1 + n2) + 4
    assert t[n1] == 0 and t[-1] == 0
    assert decode_nt6(t[:n1]) == small_genome["c1"]
    assert decode_nt6(t[n1 + 1:2 * n1 + 1]) == revcomp_str(small_genome["c1"])
