import numpy as np
import pytest

from svdss_tpu.index.fmd import build_index
from svdss_tpu.ops.pingpong_host import ping_pong_search
from svdss_tpu.utils.seq import encode_nt6, revcomp_str


def naive_ping_pong(chroms, read: str, overlap: int = -1):
    """Independent oracle: same loop structure as ping_pong.cpp:4-49 but
    membership tested by naive substring search over both strands."""
    strands = []
    for seq in chroms.values():
        strands.append(seq)
        strands.append(revcomp_str(seq))

    def present(s: str) -> bool:
        return any(s in t for t in strands)

    out = []
    l = len(read)
    if l == 0:
        return out
    begin = l - 1
    while begin >= 0:
        b0 = begin
        ok_now = present(read[begin:b0 + 1])
        while ok_now and begin > 0:
            begin -= 1
            ok_now = present(read[begin:b0 + 1])
        if begin == 0 and ok_now:
            break
        end = begin
        ok_now = present(read[end:end + 1])
        while ok_now:
            end += 1
            if end >= l:
                break
            ok_now = present(read[begin:end + 1])
        out.append((begin, end - begin + 1))
        if begin == 0:
            break
        begin = end + overlap if overlap != 0 else begin - 1
    return out


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(99)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    return {"g": bases[rng.integers(0, 4, 5000)].tobytes().decode()}


@pytest.fixture(scope="module")
def index(genome):
    return build_index(genome)


def mutate(rng, s: str, n: int) -> str:
    s = list(s)
    for _ in range(n):
        i = int(rng.integers(0, len(s)))
        s[i] = "ACGT"[int(rng.integers(0, 4))]
    return "".join(s)


def test_clean_read_no_sfs(genome, index):
    # an exact genome substring yields no SFS (whole prefix matches)
    read = genome["g"][1000:1400]
    assert ping_pong_search(index, encode_nt6(read)) == []


def test_revcomp_read_no_sfs(genome, index):
    read = revcomp_str(genome["g"][2000:2350])
    assert ping_pong_search(index, encode_nt6(read)) == []


def test_mutated_reads_match_naive(genome, index, rng):
    for trial in range(30):
        ln = int(rng.integers(150, 600))
        p = int(rng.integers(0, len(genome["g"]) - ln))
        read = genome["g"][p:p + ln]
        nmut = int(rng.integers(0, 6))
        read = mutate(rng, read, nmut)
        if rng.random() < 0.3:
            read = revcomp_str(read)
        got = ping_pong_search(index, encode_nt6(read))
        expect = naive_ping_pong(genome, read)
        assert got == expect, (trial, nmut)


def test_insertion_read(genome, index, rng):
    # read with a novel 80bp insertion -> SFS covering the junction
    p = 1500
    ins = "".join("ACGT"[i] for i in rng.integers(0, 4, 80))
    read = genome["g"][p:p + 200] + ins + genome["g"][p + 200:p + 400]
    got = ping_pong_search(index, encode_nt6(read))
    expect = naive_ping_pong(genome, read)
    assert got == expect
    assert len(got) >= 1
    # some SFS must overlap the inserted segment
    assert any(qs < 200 + 80 and qs + l > 200 for qs, l in got)


def test_random_read_overlap_chain(genome, index, rng):
    # fully random read: many SFSs, consecutive searches overlap by 1
    read = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    got = ping_pong_search(index, encode_nt6(read))
    expect = naive_ping_pong(genome, read)
    assert got == expect
    assert len(got) >= 2


def test_all_n_read(genome, index):
    got = ping_pong_search(index, encode_nt6("N" * 10))
    expect = naive_ping_pong(genome, "N" * 10)
    assert got == expect
    # genome has no Ns: every position is its own length-1 SFS... except the
    # chain: begin=9 -> backward set_intv(N) empty -> fwd emits (9,1),
    # begin=8... down to (0,1)
    assert got == [(i, 1) for i in range(9, -1, -1)]
