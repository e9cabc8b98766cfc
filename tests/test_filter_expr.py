"""samtools filter-expression evaluator (reference: htslib hts_filter on
the extractor, src/lancet/hts/extractor.cpp:57-63) + --read-filter wiring."""

from __future__ import annotations

import numpy as np
import pytest

from lancet2_tpu.hts.bam import BamRecord
from lancet2_tpu.hts.filter_expr import FilterExprError, compile_filter


def _rec(flag=0, mapq=60, pos0=100, tags=None, seq="ACGTACGTAC", tlen=150,
         qname="r1"):
    return BamRecord(
        qname=qname, flag=flag, ref_id=0, pos0=pos0, mapq=mapq,
        cigar=[(0, len(seq))], next_ref_id=0, next_pos0=pos0 + 50,
        tlen=tlen, seq=seq, qual=np.full(len(seq), 35, np.uint8),
        tags=tags or {},
    )


class TestFilterExpr:
    @pytest.mark.parametrize("expr,expected", [
        ("mapq >= 30", True),
        ("mapq >= 61", False),
        ("mapq >= 30 && !flag.dup", True),
        ("flag.dup || flag.qcfail", False),
        ("pos > 100", True),            # pos is 1-based: 101 > 100
        ("qlen == 10", True),
        ("rlen == 10", True),
        ("endpos == 110", True),
        ("tlen >= 100 && tlen <= 200", True),
        ("flag & 0x4", False),
        ("!(flag & 0x4)", True),
        ("(mapq + 10) * 2 == 140", True),
        ("mapq % 7 == 4", True),
        ('qname == "r1"', True),
        ('qname != "r2"', True),
        ('qname =~ "^r[0-9]$"', True),
        ('qname !~ "^x"', True),
    ])
    def test_basic(self, expr, expected):
        assert compile_filter(expr)(_rec()) is expected

    def test_flag_subfields(self):
        rec = _rec(flag=0x1 | 0x2 | 0x10 | 0x400)
        f = compile_filter
        assert f("flag.paired")(rec)
        assert f("flag.proper_pair")(rec)
        assert f("flag.reverse")(rec)
        assert f("flag.dup")(rec)
        assert not f("flag.unmap")(rec)
        assert not f("flag.supplementary")(rec)

    def test_aux_tags(self):
        rec = _rec(tags={"NM": 3, "SA": "chr1,100,+,50M,60,0;"})
        assert compile_filter("[NM] <= 4")(rec)
        assert not compile_filter("[NM] > 3")(rec)
        assert compile_filter("[SA]")(rec)          # exists
        assert not compile_filter("[XX]")(rec)      # missing => false
        assert not compile_filter("[XX] == 0")(rec)  # null compare => false
        assert compile_filter('[SA] =~ "chr1"')(rec)

    @pytest.mark.parametrize("bad", [
        "mapq >=", "&& mapq", "flag.bogus", "nosuchfield > 1", "(mapq > 1",
        "[toolong] == 1",
    ])
    def test_invalid_expressions_fail_fast(self, bad):
        with pytest.raises(FilterExprError):
            compile_filter(bad)


class TestCollectorWiring:
    def test_read_filter_drops_reads(self, tmp_path):
        from lancet2_tpu.core.read_collector import CollectorParams, ReadCollector
        from lancet2_tpu.core.sample_info import SampleInfo
        from lancet2_tpu.hts.bam import BamWriter
        from lancet2_tpu.hts.fasta import write_fasta
        from lancet2_tpu.utils.simulate import random_reference

        ref = random_reference(3000, seed=3)
        write_fasta(str(tmp_path / "ref.fa"), {"chrF": ref})
        bam = str(tmp_path / "s.bam")
        w = BamWriter(bam, [("chrF", 3000)], sample_name="S1")
        for i, (mq, nm) in enumerate([(60, 0), (25, 1), (60, 7), (40, 2)]):
            w.add(_rec(mapq=mq, pos0=1000 + i * 50, qname=f"q{i}",
                       seq=ref[1000 + i * 50 : 1000 + i * 50 + 10],
                       tags={"NM": nm}))
        w.close()

        def collect(expr):
            sinfo = SampleInfo(path=bam, sample_name="S1", tag=4, sample_index=0)
            coll = ReadCollector(CollectorParams(filter_expr=expr), [sinfo])
            return sorted(r.qname for r in coll.collect("chrF", 900, 1400))

        assert collect(None) == ["q0", "q1", "q2", "q3"]
        # profile filters already drop mapq<20; the expression tightens more
        assert collect("mapq >= 40") == ["q0", "q2", "q3"]
        assert collect("mapq >= 40 && [NM] <= 2") == ["q0", "q3"]

    def test_cli_rejects_bad_expression(self, tmp_path):
        from lancet2_tpu.cli.main import main as cli_main
        from lancet2_tpu.hts.bam import BamWriter
        from lancet2_tpu.hts.fasta import write_fasta
        from lancet2_tpu.utils.simulate import random_reference

        ref = random_reference(2000, seed=4)
        write_fasta(str(tmp_path / "ref.fa"), {"chrF": ref})
        bam = str(tmp_path / "s.bam")
        w = BamWriter(bam, [("chrF", 2000)], sample_name="S1")
        w.add(_rec(seq=ref[100:110]))
        w.close()
        with pytest.raises(SystemExit, match="read-filter"):
            cli_main([
                "pipeline", "-t", bam, "-r", str(tmp_path / "ref.fa"),
                "-o", str(tmp_path / "o.vcf.gz"),
                "--read-filter", "mapq >=",
            ])
