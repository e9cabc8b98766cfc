"""Ordered pass-3 mate recapture (reference: read_collector.cpp:237-271).

Contract under test:
  * --extract-pairs recaptures the out-of-region mates of kept discordant /
    SA-tagged reads, visiting pending mate regions in ASCENDING genomic
    order with opportunistic multi-capture per scan;
  * proper pairs without SA tags are NOT recaptured;
  * collection is deterministic in both recapture modes (byte-identical
    read lists across repeat runs), and recapture composes with the 6-key
    deterministic read sort.
"""

from __future__ import annotations

import numpy as np
import pytest

from lancet2_tpu.core.read_collector import CollectorParams, ReadCollector
from lancet2_tpu.core.sample_info import SampleInfo
from lancet2_tpu.hts.bam import (
    FLAG_MATE_REVERSE,
    FLAG_PAIRED,
    FLAG_PROPER_PAIR,
    FLAG_READ1,
    FLAG_READ2,
    FLAG_REVERSE,
    BamRecord,
    BamWriter,
)
from lancet2_tpu.hts.fasta import write_fasta
from lancet2_tpu.utils.simulate import random_reference

REF_LEN = 6000
WINDOW = ("chrM", 1001, 2000)  # collection window (1-based inclusive)


def _rec(qname, pos0, seq, flag, next_pos0, tags=None):
    return BamRecord(
        qname=qname, flag=flag, ref_id=0, pos0=pos0, mapq=60,
        cigar=[(0, len(seq))], next_ref_id=0, next_pos0=next_pos0,
        tlen=0, seq=seq, qual=np.full(len(seq), 35, np.uint8),
        tags=tags or {},
    )


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("recapture")
    ref = random_reference(REF_LEN, seed=8)
    fasta = str(tmp / "ref.fa")
    write_fasta(fasta, {"chrM": ref})

    L = 100
    recs = []
    # background proper pairs fully inside the window: never recaptured
    for i, off in enumerate(range(1050, 1750, 80)):
        f1 = FLAG_PAIRED | FLAG_PROPER_PAIR | FLAG_READ1 | FLAG_MATE_REVERSE
        f2 = FLAG_PAIRED | FLAG_PROPER_PAIR | FLAG_READ2 | FLAG_REVERSE
        recs.append(_rec(f"bg{i}", off, ref[off : off + L], f1, off + 120))
        recs.append(_rec(f"bg{i}", off + 120, ref[off + 120 : off + 120 + L], f2, off))

    # discordant pairs: in-window read, mate far OUTSIDE the window
    disc = [("da", 1100, 4200), ("db", 1300, 3500), ("dc", 1500, 5100)]
    for q, in_pos, mate_pos in disc:
        f_in = FLAG_PAIRED | FLAG_READ1          # NOT proper
        f_out = FLAG_PAIRED | FLAG_READ2 | FLAG_REVERSE
        recs.append(_rec(q, in_pos, ref[in_pos : in_pos + L], f_in, mate_pos))
        recs.append(_rec(q, mate_pos, ref[mate_pos : mate_pos + L], f_out, in_pos))

    # SA-tagged proper pair with an out-of-window mate: must be recaptured
    sa_in, sa_mate = 1650, 4600
    f_in = FLAG_PAIRED | FLAG_PROPER_PAIR | FLAG_READ1
    f_out = FLAG_PAIRED | FLAG_PROPER_PAIR | FLAG_READ2 | FLAG_REVERSE
    recs.append(_rec("sa1", sa_in, ref[sa_in : sa_in + L], f_in, sa_mate,
                     tags={"SA": "chrM,4601,+,100M,60,0;"}))
    recs.append(_rec("sa1", sa_mate, ref[sa_mate : sa_mate + L], f_out, sa_in))

    # proper pair with mate outside the window but NO SA tag: NOT recaptured
    pp_in, pp_mate = 1200, 3900
    f_in = FLAG_PAIRED | FLAG_PROPER_PAIR | FLAG_READ1
    f_out = FLAG_PAIRED | FLAG_PROPER_PAIR | FLAG_READ2 | FLAG_REVERSE
    recs.append(_rec("pp1", pp_in, ref[pp_in : pp_in + L], f_in, pp_mate))
    recs.append(_rec("pp1", pp_mate, ref[pp_mate : pp_mate + L], f_out, pp_in))

    recs.sort(key=lambda r: r.pos0)
    bam = str(tmp / "s.bam")
    w = BamWriter(bam, [("chrM", REF_LEN)], sample_name="S1")
    for r in recs:
        w.add(r)
    w.close()
    return {"bam": bam, "fasta": fasta}


def _collect(fixture, extract_pairs: bool):
    sinfo = SampleInfo(path=fixture["bam"], sample_name="S1", tag=4, sample_index=0)
    coll = ReadCollector(CollectorParams(extract_pairs=extract_pairs), [sinfo])
    return coll.collect(*WINDOW)


class TestMateRecapture:
    def test_recaptures_discordant_and_sa_mates_only(self, fixture):
        base = _collect(fixture, extract_pairs=False)
        with_mates = _collect(fixture, extract_pairs=True)
        base_keys = {(r.qname, r.start0) for r in base}
        extra = {(r.qname, r.start0) for r in with_mates} - base_keys
        assert extra == {(b"da", 4200), (b"db", 3500), (b"dc", 5100), (b"sa1", 4600)}

    def test_proper_pair_without_sa_not_recaptured(self, fixture):
        with_mates = _collect(fixture, extract_pairs=True)
        assert ("pp1", 3900) not in {(r.qname, r.start0) for r in with_mates}

    def test_deterministic_across_runs_both_modes(self, fixture):
        for mode in (False, True):
            a = [(r.qname, r.start0, r.sam_flag) for r in _collect(fixture, mode)]
            b = [(r.qname, r.start0, r.sam_flag) for r in _collect(fixture, mode)]
            assert a == b

    def test_output_respects_six_key_sort(self, fixture):
        from lancet2_tpu.cbdg.read import sort_key

        reads = _collect(fixture, extract_pairs=True)
        keys = [sort_key(r) for r in reads]
        assert keys == sorted(keys)
