"""CRAI index build/load/query + lazy CRAM container decode
(reference parity: htslib cram_index.c; CRAM spec appendix).

Also covers the bounded-memory contract: region fetch on a CramReader must
decode only the containers whose header span overlaps the query."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cram_fixture(tmp_path_factory):
    """Multi-container CRAM: ~120 reads over a 30kb contig, 8 records per
    slice so the file has many containers."""
    tmp = tmp_path_factory.mktemp("crai")
    from lancet2_tpu.hts.cram import CramWriter
    from lancet2_tpu.utils.simulate import ReadSimulator, random_reference
    from lancet2_tpu.hts.fasta import write_fasta

    ref = random_reference(30000, seed=13)
    fasta = str(tmp / "ref.fa")
    write_fasta(fasta, {"chrS": ref})

    sim = ReadSimulator(ref, seed=13)

    class _Collect:
        def __init__(self):
            self.recs = []

        def add(self, rec):
            self.recs.append(rec)

    col = _Collect()
    sim.simulate([], coverage=1.0, writer=col)
    recs = sorted(col.recs, key=lambda r: r.pos0)

    cram = str(tmp / "test.cram")
    w = CramWriter(cram, "@HD\tVN:1.6\n@SQ\tSN:chrS\tLN:30000\n"
                   "@RG\tID:rg1\tSM:S1\n", fasta, records_per_slice=8)
    for r in recs:
        w.add(r)
    w.close()
    return {"cram": cram, "fasta": fasta, "recs": recs}


def test_build_load_query_roundtrip(cram_fixture):
    from lancet2_tpu.hts.crai import build_crai, load_crai, query_crai

    entries = build_crai(cram_fixture["cram"])
    assert len(entries) > 4  # many slices at 8 records/slice
    loaded = load_crai(cram_fixture["cram"] + ".crai")
    assert loaded == entries

    hits = query_crai(loaded, ref_id=0, start1=10000, end1=12000)
    assert hits, "region with reads must hit slices"
    for e in hits:
        assert e.start1 <= 12000 and e.start1 - 1 + e.span > 9999
    # disjoint ref -> no hits
    assert query_crai(loaded, ref_id=1, start1=1, end1=30000) == []
    # slice sizes must tile the containers (offsets strictly increasing)
    offs = [(e.container_offset, e.slice_offset) for e in entries]
    assert offs == sorted(offs)


def test_crai_entries_match_container_table(cram_fixture):
    """The .crai container offsets must address real container headers."""
    from lancet2_tpu.hts.cram import CramReader
    from lancet2_tpu.hts.crai import build_crai

    entries = build_crai(cram_fixture["cram"])
    rdr = CramReader(cram_fixture["cram"], cram_fixture["fasta"])
    table_offsets = {p for p, _ch, _c in rdr._containers}
    assert {e.container_offset for e in entries} <= table_offsets


def test_lazy_fetch_decodes_only_overlapping_containers(cram_fixture):
    from lancet2_tpu.hts.cram import CramReader

    rdr = CramReader(cram_fixture["cram"], cram_fixture["fasta"])
    n_containers = len(rdr._containers)
    out = rdr.fetch("chrS", 15000, 15400)
    assert 0 < len(rdr._decoded) < n_containers, (
        f"fetch decoded {len(rdr._decoded)}/{n_containers} containers"
    )
    expect = [r for r in cram_fixture["recs"]
              if r.pos0 < 15400 and r.reference_end0() > 14999]
    assert [(r.qname, r.pos0) for r in out] == [(r.qname, r.pos0) for r in expect]


def test_full_decode_property_still_exact(cram_fixture):
    from lancet2_tpu.hts.cram import CramReader

    rdr = CramReader(cram_fixture["cram"], cram_fixture["fasta"])
    recs = rdr.all_records()
    assert len(recs) == len(cram_fixture["recs"])
    for got, exp in zip(recs, cram_fixture["recs"]):
        assert (got.qname, got.pos0, got.seq) == (exp.qname, exp.pos0, exp.seq)


def test_cli_index_builds_crai(cram_fixture, capsys):
    from lancet2_tpu.cli.main import main

    rc = main(["index", cram_fixture["cram"]])
    assert rc == 0
    assert capsys.readouterr().out.strip().endswith(".crai")
