import numpy as np

from svdss_tpu.io.bgzf import BgzfReader, BgzfWriter
from svdss_tpu.io.bam import (BamHeader, BamReader, BamRecord, BamWriter,
                              aligned_pairs, BAM_CMATCH, BAM_CINS, BAM_CDEL,
                              BAM_CSOFT_CLIP)
from svdss_tpu.io.fasta import load_chromosomes, write_fasta
from svdss_tpu.io.sfs_file import write_sfs_file, parse_sfs_file
from svdss_tpu.models import SFS
from svdss_tpu.utils.seq import encode_nt6, decode_nt6, revcomp_str


def test_bgzf_roundtrip(tmp_path, rng):
    data = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    p = tmp_path / "x.bgzf"
    with BgzfWriter(str(p)) as w:
        for i in range(0, len(data), 7919):
            w.write(data[i:i + 7919])
    r = BgzfReader(str(p))
    assert r.read() == data
    # chunked reads
    r2 = BgzfReader(str(p))
    out = bytearray()
    while True:
        c = r2.read(12345)
        if not c:
            break
        out += c
    assert bytes(out) == data


def test_bgzf_gzip_compatible(tmp_path):
    # BGZF is valid multi-member gzip
    import gzip
    p = tmp_path / "y.bgzf"
    with BgzfWriter(str(p)) as w:
        w.write(b"hello world " * 10000)
    with gzip.open(str(p), "rb") as fh:
        assert fh.read() == b"hello world " * 10000


def test_bam_roundtrip(tmp_path):
    header = BamHeader.from_refs([("chr1", 1000), ("chr2", 500)])
    recs = [
        BamRecord("readA", 0, 0, 10, 60, [(5, BAM_CSOFT_CLIP),
                                          (20, BAM_CMATCH), (3, BAM_CINS),
                                          (4, BAM_CDEL), (10, BAM_CMATCH)],
                  "ACGT" * 9 + "AC", b"\x28" * 38,
                  [("HP", "i", 1), ("XF", "i", 0), ("RG", "Z", "grp1")]),
        BamRecord("readB", 16, 1, 77, 13, [(8, BAM_CMATCH)],
                  "ACGTACGN", b"\x20" * 8),
    ]
    p = tmp_path / "t.bam"
    with BamWriter(str(p), header) as w:
        for r in recs:
            w.write(r)
    rd = BamReader(str(p))
    assert rd.header.refs == [("chr1", 1000), ("chr2", 500)]
    got = list(rd)
    assert len(got) == 2
    for a, b in zip(recs, got):
        assert a.qname == b.qname
        assert a.flag == b.flag
        assert a.tid == b.tid
        assert a.pos == b.pos
        assert a.mapq == b.mapq
        assert a.cigar == b.cigar
        assert a.seq == b.seq
        assert a.qual == b.qual
        assert a.aux == b.aux
    assert got[0].get_tag("HP") == 1
    assert got[0].get_tag("XF") == 0
    assert got[0].get_tag("RG") == "grp1"
    assert got[1].get_tag("HP") is None


def test_aligned_pairs():
    # mirrors reference get_aligned_pairs semantics (bam.cpp:92-134)
    rec = BamRecord("r", 0, 0, 100, 60,
                    [(2, BAM_CSOFT_CLIP), (3, BAM_CMATCH), (2, BAM_CINS),
                     (2, BAM_CDEL), (2, BAM_CMATCH)],
                    "ACGTACGTACG"[:11], b"\x28" * 11)
    pairs = aligned_pairs(rec)
    assert pairs == [(0, -1), (1, -1),
                     (2, 100), (3, 101), (4, 102),
                     (5, -1), (6, -1),
                     (-1, 103), (-1, 104),
                     (7, 105), (8, 106)]
    assert rec.end_pos() == 107


def test_fasta_roundtrip(tmp_path):
    chroms = {"c1": "ACGTN" * 50, "c2": "GATTACA" * 30}
    p = tmp_path / "g.fa"
    write_fasta(str(p), chroms)
    assert load_chromosomes(str(p)) == chroms


def test_sfs_file_roundtrip(tmp_path):
    groups = [("r1", [SFS("r1", 5, 30, 1), SFS("r1", 50, 22, 1)]),
              ("r2", [SFS("r2", 0, 40, 0)])]
    p = tmp_path / "specifics.txt"
    with open(p, "w") as fh:
        n = write_sfs_file(fh, groups)
    assert n == 3
    text = p.read_text()
    assert text.splitlines()[0] == "r1\t5\t30\t1\t"
    assert text.splitlines()[1] == "*\t50\t22\t1\t"
    parsed = parse_sfs_file(str(p))
    assert set(parsed) == {"r1", "r2"}
    assert [(s.qs, s.l, s.htag) for s in parsed["r1"]] == [(5, 30, 1),
                                                           (50, 22, 1)]


def test_nt6_roundtrip():
    s = "ACGTNacgtnXY-"
    enc = encode_nt6(s)
    assert list(enc) == [1, 2, 3, 4, 5, 1, 2, 3, 4, 5, 5, 5, 5]
    assert decode_nt6(enc) == "ACGTNACGTNNNN"
    assert revcomp_str("AACGT") == "ACGTT"
    assert revcomp_str("ANacg") == "cgtNT"
