"""Post-simulation enrichment accounting (sim_scripts/est_genome_yield.py).

Joins a simulation's output PAF (ej/dl tags) with the control run's
sequencing summary and a minimap2 truth PAF, and reports on/off-target
base yield with and without adaptive sampling.
"""

from __future__ import annotations

import sys

import numpy as np

from ..pafstats import parse_paf
from .sim_utils import SeqsumProfile


def ref_seq_names(prefix: str) -> set[str]:
    """Reference sequence names from our index or a BWA .ann file."""
    import os

    if os.path.exists(prefix + ".utidx.npz") or prefix.endswith(".utidx.npz"):
        from ..index.fmindex import FMIndex

        return set(FMIndex.load(prefix).ref_names)
    names = set()
    with open(prefix + ".ann") as f:
        nrefs = int(f.readline().split()[1])
        for _ in range(nrefs):
            names.add(f.readline().split()[1])
            f.readline()
    return names


def est_genome_yield(unc_paf: str, seq_sum: str, minimap_paf: str,
                     index_prefix: str, deplete: bool, sim_speed: float = 1.0,
                     out=None):
    out = out or sys.stdout
    ref_seqs = ref_seq_names(index_prefix)

    unc_reads: dict[str, list] = {}
    for p in parse_paf(unc_paf):
        v = (
            p.qr_len,
            p.tags.get("ej", (None, 0))[0],
            p.tags.get("dl", (0, 0))[0],
        )
        unc_reads.setdefault(p.qr_name, []).append(v)

    mm2 = [
        (p.qr_name, p.rf_name)
        for p in parse_paf(minimap_paf)
        if p.is_mapped and p.tags.get("tp", ("P",))[0] == "P"
    ]
    tgt_reads = {
        q for q, r in mm2
        if (deplete and r not in ref_seqs) or (not deplete and r in ref_seqs)
    }

    ctl = SeqsumProfile(seq_sum)
    ctl.rm_scans()

    co = ct = uo = ut = 0.0
    for i in range(len(ctl)):
        read_id = ctl.ids[i]
        rec = ctl.reads[i]
        seqlen = rec["bases"]
        ontgt = read_id in tgt_reads
        if ontgt:
            ct += seqlen
        else:
            co += seqlen
        alns = unc_reads.get(read_id)
        if alns is None:
            continue
        bpps = seqlen / rec["tmpl_dur"]
        for unc_est, eject_time, delay_time in alns:
            if eject_time is not None:
                unclen = bpps * (
                    unc_est / 450.0 + delay_time / 4000.0 + eject_time
                    - rec["tmpl_delay"]
                )
                if ontgt:
                    ut += min(seqlen, unclen)
                else:
                    uo += min(seqlen, unclen)
            elif ontgt:
                ut += seqlen
            else:
                uo += seqlen

    co, ct, uo, ut = (x / 1e6 for x in (co, ct, uo, ut))
    out.write("unc_on_bp\t%.6f\n" % (ut / sim_speed))
    out.write("unc_total_bp\t%.6f\n" % ((ut + uo) / sim_speed))
    out.write("cnt_on_bp\t%.6f\n" % ct)
    out.write("cnt_total_bp\t%.6f\n" % (ct + co))
    return {
        "unc_on_bp": ut / sim_speed,
        "unc_total_bp": (ut + uo) / sim_speed,
        "cnt_on_bp": ct,
        "cnt_total_bp": ct + co,
    }


def est_bed_yield(unc_paf: str, cov_bed: str, seq_sum: str,
                  sim_speed: float = 1.0, out=None):
    """BED-target enrichment accounting (sim_scripts/est_bed_yield.py:1-101).

    Like est_genome_yield, but on-target is defined per-base from a BED
    coverage file (``bedtools intersect`` of the control alignments with
    the target regions): each read contributes its covered base count,
    and an ejected read's salvage estimate replaces the full length.
    """
    out = out or sys.stdout

    unc_reads: dict[str, list] = {}
    for p in parse_paf(unc_paf):
        v = (
            p.qr_len,
            p.tags.get("ej", (None, 0))[0],
            p.tags.get("dl", (0, 0))[0],
        )
        unc_reads.setdefault(p.qr_name, []).append(v)

    # BED rows: chrom, start, end, read_id -> on-target bases per read
    tgt_bp: dict[str, int] = {}
    with open(cov_bed) as f:
        for line in f:
            t = line.split()
            if len(t) < 4:
                continue
            tgt_bp[t[3]] = tgt_bp.get(t[3], 0) + int(t[2]) - int(t[1])

    ctl = SeqsumProfile(seq_sum)
    ctl.rm_scans()

    co = ct = uo = ut = 0.0
    for i in range(len(ctl)):
        rec = ctl.reads[i]
        seqlen = rec["bases"]
        on_bp = tgt_bp.get(ctl.ids[i], 0)
        ct += on_bp
        co += seqlen - on_bp
        alns = unc_reads.get(ctl.ids[i])
        if alns is None:
            continue
        bpps = seqlen / rec["tmpl_dur"]
        for unc_est, eject_time, delay_time in alns:
            if eject_time is not None:
                unclen = bpps * (
                    unc_est / 450.0 + delay_time / 4000.0 + eject_time
                    - rec["tmpl_delay"]
                )
                if on_bp > 0:
                    ut += unclen
                else:
                    uo += unclen
            else:
                ut += on_bp
                uo += seqlen - on_bp

    co, ct, uo, ut = (x / 1e6 for x in (co, ct, uo, ut))
    out.write("unc_on_bp\t%.6f\n" % (ut / sim_speed))
    out.write("unc_total_bp\t%.6f\n" % ((ut + uo) / sim_speed))
    out.write("cnt_on_bp\t%.6f\n" % ct)
    out.write("cnt_total_bp\t%.6f\n" % (ct + co))
    return {
        "unc_on_bp": ut / sim_speed,
        "unc_total_bp": (ut + uo) / sim_speed,
        "cnt_on_bp": ct,
        "cnt_total_bp": ct + co,
    }
