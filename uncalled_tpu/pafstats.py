"""PAF parsing and accuracy/speed statistics.

Behavioral port of the reference's pafstats (uncalled/pafstats.py:8-206):
typed-tag PAF records, TP/TN/FP/FN/NA comparison against a ground-truth PAF
with 1.5x query-proportional reference extension, and the mean/median speed
summary derived from the mt tag.
"""

from __future__ import annotations

import sys

import numpy as np


class PafEntry:
    __slots__ = (
        "qr_name", "qr_len", "is_mapped", "qr_st", "qr_en", "is_fwd",
        "rf_name", "rf_len", "rf_st", "rf_en", "match_num", "aln_len",
        "qual", "tags",
    )

    def __init__(self, line: str):
        t = line.split()
        self.qr_name = t[0]
        self.qr_len = int(t[1])
        self.is_mapped = t[4] != "*"
        if self.is_mapped:
            self.qr_st = int(t[2])
            self.qr_en = int(t[3])
            self.is_fwd = t[4] == "+"
            self.rf_name = t[5]
            self.rf_len = int(t[6])
            self.rf_st = int(t[7])
            self.rf_en = int(t[8])
            self.match_num = int(t[9])
            self.aln_len = int(t[10])
            self.qual = int(t[11])
        else:
            self.qr_st, self.qr_en = 1, self.qr_len
            self.is_fwd = self.rf_name = self.rf_len = None
            self.rf_st = self.rf_en = self.match_num = None
            self.aln_len = self.qual = None
        self.tags = {}
        for s in t[12:]:
            k, typ, v = s.split(":", 2)
            if typ == "f":
                v = float(v)
            elif typ == "i":
                v = int(v)
            self.tags[k] = (v, typ)

    def get_tag(self, k):
        return self.tags.get(k, (None, None))[0]

    def set_tag(self, k, v, typ="Z"):
        self.tags[k] = (v, typ)

    def ext_ref(self, ext: float):
        """Reference interval extended proportionally to the unmapped query
        flanks (pafstats.py:71-80)."""
        st_shift = int(self.qr_st * ext)
        en_shift = int((self.qr_len - self.qr_en) * ext)
        if self.is_fwd:
            return (max(1, self.rf_st - st_shift),
                    min(self.rf_len, self.rf_en + en_shift))
        return (max(1, self.rf_st - en_shift),
                min(self.rf_len, self.rf_en + st_shift))

    def overlaps(self, other: "PafEntry", ext: float = 0.0) -> bool:
        if not (self.is_mapped and other.is_mapped):
            return False
        if not self.rf_name.startswith(other.rf_name):
            return False
        st1, en1 = self.ext_ref(ext)
        st2, en2 = other.ext_ref(ext)
        return max(st1, st2) <= min(en1, en2)

    def __str__(self):
        tagstr = "\t".join(
            ":".join([k, v[1], str(v[0])]) for k, v in self.tags.items()
        )
        if self.is_mapped:
            core = (
                self.qr_name, self.qr_len, self.qr_st, self.qr_en,
                "+" if self.is_fwd else "-", self.rf_name, self.rf_len,
                self.rf_st, self.rf_en, self.match_num, self.aln_len,
                self.qual,
            )
            s = "\t".join(str(x) for x in core)
        else:
            s = "\t".join((self.qr_name, str(self.qr_len)) + ("*",) * 10)
        return s + ("\t" + tagstr if tagstr else "")


def parse_paf(infile, max_load=None):
    if isinstance(infile, str):
        infile = open(infile)
    c = 0
    for line in infile:
        if line.startswith("#") or not line.strip():
            continue
        if max_load is not None and c >= max_load:
            break
        yield PafEntry(line)
        c += 1


def paf_ref_compare(qry, ref, ext: float = 1.5, check_locs: bool = True):
    """Classify query mappings against ground truth: returns
    (tp, tn, fp, fn, na) lists of query entries (pafstats.py:119-158)."""
    ref_locs: dict[str, list[PafEntry]] = {}
    for r in ref:
        ref_locs.setdefault(r.qr_name, []).append(r)

    tp, tn, fp, fn, na = [], [], [], [], []
    for q in qry:
        rs = ref_locs.get(q.qr_name)
        if q.is_mapped:
            if rs is None or not rs[0].is_mapped:
                na.append(q)
            elif any(
                q.overlaps(r, ext) if check_locs else q.rf_name == r.rf_name
                for r in rs
            ):
                tp.append(q)
            else:
                fp.append(q)
        else:
            if rs is None or not rs[0].is_mapped:
                tn.append(q)
            else:
                fn.append(q)
    return tp, tn, fp, fn, na


def run(infile, ref_paf=None, max_reads=None, annotate=False, out=None):
    out = out or sys.stdout
    statsout = sys.stderr if annotate else out
    locs = list(parse_paf(infile, max_reads))
    if not locs:
        statsout.write("Summary: 0 reads\n")
        return
    num_mapped = sum(p.is_mapped for p in locs)
    statsout.write(
        "Summary: %d reads, %d mapped (%.2f%%)\n\n"
        % (len(locs), num_mapped, 100 * num_mapped / len(locs))
    )

    if ref_paf is not None:
        statsout.write("Comparing to reference PAF\n")
        tp, tn, fp, fn, na = paf_ref_compare(locs, parse_paf(ref_paf))
        n = len(locs)
        statsout.write("     P     N\n")
        statsout.write("T %6.2f %5.2f\n" % (100 * len(tp) / n, 100 * len(tn) / n))
        statsout.write("F %6.2f %5.2f\n" % (100 * len(fp) / n, 100 * len(fn) / n))
        statsout.write("NA: %.2f\n\n" % (100 * len(na) / n))
        if annotate:
            for grp, lab in [(tp, "tp"), (tn, "tn"), (fp, "fp"), (fn, "fn"),
                             (na, "na")]:
                for p in grp:
                    p.set_tag("rf", lab, "Z")
                    out.write(f"{p}\n")

    if locs[0].get_tag("mt") is not None:
        mapped = [p for p in locs if p.is_mapped]
        if mapped:
            ms = np.array([p.get_tag("mt") for p in mapped], dtype=float)
            bp = np.array([p.qr_en for p in mapped], dtype=float)
            bpps = 1000 * bp / ms
            statsout.write("Speed            Mean    Median\n")
            statsout.write(
                "BP per sec: %9.2f %9.2f\n" % (np.mean(bpps), np.median(bpps))
            )
            statsout.write(
                "BP mapped:  %9.2f %9.2f\n" % (np.mean(bp), np.median(bp))
            )
            statsout.write(
                "MS to map:  %9.2f %9.2f\n" % (np.mean(ms), np.median(ms))
            )
