"""Build ClientSim patterns from real sequencing runs.

Behavioral port of the reference sim pattern builder (uncalled/sim_utils.py):

* ``SeqsumProfile``     -- parse a sequencing_summary.txt into per-read arrays
                           (sim_utils.py:99-166).
* ``find_scans``        -- detect mux-scan periods from the 4-mux block
                           structure of read starts (sim_utils.py:20-97).
* ``rm_scans``          -- excise scan periods, shifting later reads
                           (sim_utils.py:168-193).
* ``compute_eject_delays`` -- per-read ejection latency from an UNCALLED PAF's
                           ej/ub tags (sim_utils.py:195-206).
* ``compute_gaps``      -- per-channel inter-read gaps (sim_utils.py:208-221).
* ``load_sim``          -- populate a ClientSim: intervals/gaps/delays from the
                           UNCALLED run, control-run reads assigned to channels
                           proportionally to UNCALLED channel activity with a
                           min-per-channel floor (sim_utils.py:249-442).
"""

from __future__ import annotations

import sys
from collections import Counter

import numpy as np

from ..pafstats import parse_paf

SAMP_RATE = 4000


def find_scans(sts, ens, mxs, max_block_gap=1, max_intv_gap=20,
               min_mux_frac=0.95):
    """Mux-scan windows: four consecutive single-mux blocks (mux 1..4)."""
    order = np.argsort(sts)
    sts, ens, mxs = sts[order], ens[order], mxs[order]

    blocks = []
    bst, ben = sts[0], ens[0]
    for rst, ren in zip(sts[1:], ens[1:]):
        if rst - ben > max_block_gap:
            blocks.append((bst, ben))
            bst, ben = rst, ren
        else:
            ben = max(ren, ben)
    blocks.append((bst, ben))

    scan_segs, scan, scan_gaps = [], [], []
    gap1 = 0
    prev_en = 0
    for bst, ben in blocks:
        if scan and bst - scan[-1][1] > max_intv_gap:
            if len(scan) == 4:
                scan_segs.append(scan)
            scan = []
        counts = Counter(mxs[(sts >= bst) & (sts < ben)])
        pairs = [(c, m) for m, c in counts.items()]
        top_count, top_mux = max(pairs)
        if top_count / sum(c for c, _ in pairs) >= min_mux_frac:
            if top_mux != 4 and len(scan) == 4:
                scan_segs.append(scan)
                scan_gaps.append((gap1, bst - scan[-1][1]))
                scan = []
            if scan and top_mux == len(scan):
                if ben - scan[-1][1] < max_intv_gap:
                    scan[-1] = (scan[-1][0], ben)
                elif top_mux == 1:
                    scan[0] = (bst, ben)
                    gap1 = bst - prev_en
            elif top_mux - 1 == len(scan):
                scan.append((bst, ben))
                if len(scan) == 1:
                    gap1 = bst - prev_en
            else:
                scan = []
        else:
            if len(scan) == 4:
                scan_segs.append(scan)
                scan_gaps.append((gap1, bst - scan[-1][1]))
            scan = []
        prev_en = ben

    return [
        (segs[0][0] - gaps[0], segs[-1][1] + gaps[1])
        for segs, gaps in zip(scan_segs, scan_gaps)
    ]


class SeqsumProfile:
    PROPS = ["chs", "sts", "lns", "mxs", "ids", "ens", "glns", "gsts",
             "tms", "tds", "bps", "dls"]

    def __init__(self, fname: str, min_st: float = 0, max_en: float = np.inf,
                 num_channels: int = 512):
        self.num_channels = num_channels
        cols = {}
        rows = {k: [] for k in
                ("ids", "chs", "sts", "mxs", "lns", "ens", "tms", "tds", "bps")}
        with open(fname) as f:
            header = f.readline().split()
            idx = {name: header.index(name) for name in (
                "channel", "start_time", "duration", "mux", "read_id",
                "template_start", "template_duration",
                "sequence_length_template")}
            for line in f:
                t = line.split()
                st = float(t[idx["start_time"]])
                ln = float(t[idx["duration"]])
                en = st + ln
                if st < min_st or en > max_en:
                    continue
                rows["sts"].append(st)
                rows["lns"].append(ln)
                rows["ens"].append(en)
                rows["chs"].append(int(t[idx["channel"]]))
                rows["mxs"].append(int(t[idx["mux"]]))
                rows["ids"].append(t[idx["read_id"]])
                rows["tms"].append(float(t[idx["template_start"]]) - st)
                rows["tds"].append(float(t[idx["template_duration"]]))
                rows["bps"].append(int(t[idx["sequence_length_template"]]))
        for k, v in rows.items():
            setattr(self, k, np.array(v))
        self.sort(np.argsort(self.sts))
        self.chodr = np.arange(num_channels) + 1
        self._count_channels()
        self.duration = float(np.max(self.ens)) if len(self.ens) else 0.0

    def _count_channels(self):
        self.chcts = np.array(
            [np.sum(self.chs == ch) for ch in np.arange(self.num_channels) + 1]
        )

    def sort(self, order):
        for pr in SeqsumProfile.PROPS:
            a = getattr(self, pr, None)
            if a is not None:
                setattr(self, pr, a[order])

    def chsort(self, odr):
        self.chodr = self.chodr[odr]
        self.chcts = self.chcts[odr]

    def rm_scans(self):
        """Remove mux-scan periods, shifting subsequent times; returns the
        scan boundary times (in run-relative seconds)."""
        scans = find_scans(self.sts, self.ens, self.mxs)
        bounds = []
        sh = 0
        for st, en in scans:
            m = np.flatnonzero((self.sts + sh >= st) & (self.ens + sh <= en))
            for pr in SeqsumProfile.PROPS:
                a = getattr(self, pr, None)
                if a is not None:
                    setattr(self, pr, np.delete(a, m))
            bounds.append(st - sh)
            self.sts[self.sts + sh >= st] -= en - st
            self.ens[self.ens + sh >= st] -= en - st
            sh += en - st
        bounds.append(float(np.max(self.ens)))
        self._count_channels()
        return np.array(bounds)

    def compute_eject_delays(self, paf_path: str):
        self.dls = np.full(len(self.sts), np.inf)
        idxs = {rid: i for i, rid in enumerate(self.ids)}
        tlns = self.lns - self.tms
        for p in parse_paf(paf_path):
            i = idxs.get(p.qr_name)
            if i is not None and ("ej" in p.tags or "ub" in p.tags):
                ej = p.tags.get("ej", p.tags.get("ub"))[0]
                self.dls[i] = max(0, tlns[i] - (p.qr_len / 450.0 + ej))

    def compute_gaps(self):
        self.gsts = np.zeros(len(self.ids))
        self.glns = np.zeros(len(self.ids))
        for ch in np.arange(self.num_channels) + 1:
            m = self.chs == ch
            cens = self.ens[m]
            gsts = np.insert(cens[:-1], 0, 0)
            self.gsts[m] = gsts
            self.glns[m] = self.sts[m] - gsts

    def __len__(self):
        return len(self.sts)


def sec_to_samp(sec, coef=1.0):
    return int(np.round(sec * SAMP_RATE * coef))


def load_sim(client, conf):
    """Populate `client` (ClientSim) from conf.simulator's run files."""
    sp = conf.simulator
    n_ch = len(client.channels)
    CHS = np.arange(n_ch) + 1

    sys.stderr.write("Loading UNCALLED seqsum...\n")
    unc = SeqsumProfile(sp.unc_seqsum, num_channels=n_ch)
    unc_scans = unc.rm_scans()
    unc.compute_gaps()
    unc.compute_eject_delays(sp.unc_paf)
    delays = unc.dls[unc.dls != np.inf]
    DELAY = np.median(delays) if len(delays) else 0.0
    unc.chsort(np.argsort(unc.chcts))

    sys.stderr.write("Generating pattern...\n")
    active_thresh = np.median(unc.glns) + np.std(unc.glns)

    for ch in CHS:
        ch_i = unc.chs == ch
        if not np.any(ch_i):
            continue
        gsts = unc.gsts[ch_i]
        glns = unc.glns[ch_i]

        sc = 0
        itv_st = 0.0
        for br in np.flatnonzero(glns >= active_thresh):
            act_en = gsts[br]
            while sc + 1 < len(unc_scans) and unc_scans[sc + 1] < act_en:
                client.add_intv(
                    ch, sc,
                    sec_to_samp(itv_st - unc_scans[sc], sp.sim_speed),
                    sec_to_samp(sp.scan_intv_time, sp.sim_speed),
                )
                itv_st = unc_scans[sc + 1]
                sc += 1
            if itv_st != act_en:
                client.add_intv(
                    ch, sc,
                    sec_to_samp(itv_st - unc_scans[sc], sp.sim_speed),
                    sec_to_samp(act_en - unc_scans[sc], sp.sim_speed),
                )
            itv_st = act_en + glns[br]
            while sc + 1 < len(unc_scans) and unc_scans[sc + 1] < itv_st:
                sc += 1

        last = np.max(unc.ens[ch_i])
        while sc < len(unc_scans) - 1 and unc_scans[sc] < last:
            itv_en = min(last - unc_scans[sc], sp.scan_intv_time)
            client.add_intv(
                ch, sc,
                sec_to_samp(itv_st - unc_scans[sc], sp.sim_speed),
                sec_to_samp(itv_en, sp.sim_speed),
            )
            itv_st = unc_scans[sc + 1]
            sc += 1

        for sc2 in range(len(unc_scans) - 1):
            sc_i = (gsts > unc_scans[sc2]) & ((gsts + glns) <= unc_scans[sc2 + 1])
            for ln in glns[sc_i]:
                if 0 < ln < active_thresh:
                    client.add_gap(ch, sc2, sec_to_samp(ln))
            for dl in unc.dls[ch_i][sc_i]:
                if dl != np.inf:
                    client.add_delay(ch, sc2, sec_to_samp(DELAY))

    sys.stderr.write("Loading control seqsum...\n")
    ctl = SeqsumProfile(sp.ctl_seqsum, num_channels=n_ch)
    ctl.rm_scans()
    ctl.chsort(np.argsort(ctl.chcts))

    sys.stderr.write("Ordering reads...\n")
    min_const = np.zeros(n_ch)
    min_const[unc.chcts > 0] = sp.min_ch_reads
    tgt_total = np.sum(ctl.chcts)
    max_prpl = tgt_total * unc.chcts / np.sum(unc.chcts)
    remain = max_prpl - min_const
    remain_clp = np.clip(remain, 0, np.inf)
    tgt_counts = min_const + np.sum(remain) * remain_clp / np.sum(remain_clp)
    tgt_counts = np.round(tgt_counts).astype(int)
    dr = -1 if np.sum(tgt_counts) > tgt_total else 1
    i = len(tgt_counts) - 1
    while np.sum(tgt_counts) != tgt_total:
        tgt_counts[i] += dr
        i -= 1

    diff = ctl.chcts - tgt_counts
    odr = np.flip(np.argsort(diff), 0)
    diff = diff[odr]
    tgt_counts = tgt_counts[odr]
    ctl.chsort(odr)
    unc.chsort(odr)

    sim_reads = [None] * n_ch
    extra = []
    e = 0
    for i in range(n_ch):
        j = ctl.chs == ctl.chodr[i]
        ctl_reads = list(zip(ctl.ids[j], ctl.tms[j]))
        tgt = tgt_counts[i]
        if diff[i] >= 0:
            new_reads = ctl_reads[:tgt]
            if diff[i] > 0:
                extra.append(ctl_reads[tgt:])
        else:
            new_reads = ctl_reads
            while len(new_reads) < tgt and e < len(extra):
                needed = tgt - len(new_reads)
                if len(extra[e]) > needed:
                    new_reads += extra[e][:needed]
                    extra[e] = extra[e][needed:]
                else:
                    new_reads += extra[e]
                    e += 1
            if len(new_reads) < tgt:
                raise RuntimeError("not enough control reads to fill channels")
        sim_reads[unc.chodr[i] - 1] = new_reads

    for ch in CHS:
        for rd, tm in sim_reads[ch - 1] or []:
            client.add_read(int(ch), rd, sec_to_samp(tm))
