"""Active-region prescan: cheap mutation-evidence filter before assembly.

Reference: src/lancet/core/active_region_detector.cpp. A window is active
when any genome position accumulates >=2 supporting reads of mutation
evidence across one sample: MD-tag mismatches (base qual >= 20), CIGAR
I/D/X events, or soft-clip positions. Reads failing QC/dup/unmapped/MAPQ==0
are ignored.
"""

from __future__ import annotations

from collections import defaultdict

from lancet2_tpu.hts.bam import BamRecord, BamReader
from lancet2_tpu.hts.cigar import CONSUMES_REF, D, I, S, X

MIN_BASE_QUAL = 20


def _parse_md_hits(md: str, quals, start0: int, counts: dict) -> bool:
    """MD state machine; True when any position reaches 2 mismatch hits."""
    genome_pos = start0
    token = ""
    i = 0
    n = len(md)
    while i < n:
        ch = md[i]
        if ch.isdigit():
            token += ch
            i += 1
            continue
        genome_pos += int(token) if token else 0
        token = ""
        if ch == "^":
            # deletion run: skip deleted ref bases, do not advance genome_pos
            # counting (reference ParseMd ignores ^ runs for mismatch hits)
            i += 1
            while i < n and md[i].isalpha():
                i += 1
                genome_pos += 1
            continue
        base_pos = genome_pos - start0
        if 0 <= base_pos < len(quals) and quals[base_pos] >= MIN_BASE_QUAL:
            if ch.upper() in "ACGT":
                counts[genome_pos] += 1
                if counts[genome_pos] == 2:
                    return True
        genome_pos += 1
        i += 1
    return False


class MutationAccumulator:
    def __init__(self):
        self.mismatches = defaultdict(int)
        self.insertions = defaultdict(int)
        self.deletions = defaultdict(int)
        self.softclips = defaultdict(int)

    def check_alignment(self, rec: BamRecord) -> bool:
        if rec.is_qcfail or rec.is_duplicate or rec.is_unmapped or rec.mapq == 0:
            return False
        if self._check_md(rec):
            return True
        if self._check_cigar(rec):
            return True
        return self._check_softclips(rec)

    def _check_md(self, rec: BamRecord) -> bool:
        md = rec.tags.get("MD")
        if not isinstance(md, str):
            return False
        return _parse_md_hits(md, rec.qual, rec.pos0, self.mismatches)

    def _check_cigar(self, rec: BamRecord) -> bool:
        pos = rec.pos0
        for op, length in rec.cigar:
            if op in CONSUMES_REF:
                pos += length
            if op == I:
                self.insertions[pos] += 1
                if self.insertions[pos] == 2:
                    return True
            elif op == D:
                self.deletions[pos] += 1
                if self.deletions[pos] == 2:
                    return True
            elif op == X:
                self.mismatches[pos] += 1
                if self.mismatches[pos] == 2:
                    return True
        return False

    def _check_softclips(self, rec: BamRecord) -> bool:
        if not rec.cigar:
            return False
        hits = []
        if rec.cigar[0][0] == S:
            hits.append(rec.pos0)
        if len(rec.cigar) > 1 and rec.cigar[-1][0] == S:
            hits.append(rec.reference_end0())
        for pos in hits:
            self.softclips[pos] += 1
            if self.softclips[pos] == 2:
                return True
        return False


def is_active_region(readers: list[BamReader], chrom: str, start1: int, end1: int) -> bool:
    for reader in readers:
        acc = MutationAccumulator()
        for rec in reader.fetch(chrom, start1, end1):
            if acc.check_alignment(rec):
                return True
    return False


def has_md_tag(reader: BamReader, num_reads_to_peek: int = 1000) -> bool:
    for i, rec in enumerate(reader.all_records()):
        if i > num_reads_to_peek:
            break
        if "MD" in rec.tags:
            return True
    return False
