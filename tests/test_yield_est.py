"""Yield estimators (est_genome_yield / est_bed_yield) on synthetic runs.

Reference: sim_scripts/est_genome_yield.py and est_bed_yield.py.
"""

import io

import pytest

from uncalled_tpu.realtime.yield_est import est_bed_yield, est_genome_yield

HEADER = (
    "filename\tread_id\tchannel\tmux\tstart_time\tduration\t"
    "template_start\ttemplate_duration\tsequence_length_template\n"
)


@pytest.fixture
def bed_inputs(tmp_path):
    # control run: 4 reads, 2 on-target (per BED), 2 off-target
    rows = []
    for i, (st, dur, bases) in enumerate(
        [(10, 4, 2000), (20, 4, 3000), (30, 4, 1500), (40, 4, 2500)]
    ):
        rows.append(
            f"f5\tread_{i}\t1\t1\t{st}\t{dur}\t{st + 0.2}\t{dur - 0.2}\t{bases}\n"
        )
    seqsum = tmp_path / "ctl.txt"
    seqsum.write_text(HEADER + "".join(rows))

    bed = tmp_path / "cov.bed"
    bed.write_text("ref\t100\t1100\tread_0\nref\t0\t1500\tread_2\n")

    # sim PAF: read_0 kept (on-target), read_1 ejected after 450 bp
    paf = tmp_path / "sim.paf"
    paf.write_text(
        "read_0\t2000\t0\t450\t+\tref\t10000\t100\t550\t450\t450\t255"
        "\tst:i:40000\n"
        "read_1\t450\t0\t450\t+\tref\t10000\t900\t1350\t450\t450\t255"
        "\tej:f:0.3\tdl:f:400\tst:i:80000\n"
    )
    return str(paf), str(bed), str(seqsum)


def test_est_genome_yield(bed_inputs, tmp_path):
    paf, _, seqsum = bed_inputs
    # index with one sequence "ref"; minimap truth: read_0/read_1 map to
    # ref (on-target for enrich), read_2 maps elsewhere, read_3 unmapped
    ann = tmp_path / "idx.ann"
    ann.write_text("10000 1 11\n0 ref\n0 10000 0\n")
    mm2 = tmp_path / "truth.paf"
    mm2.write_text(
        "read_0\t2000\t0\t2000\t+\tref\t10000\t0\t2000\t2000\t2000\t60"
        "\ttp:A:P\n"
        "read_1\t3000\t0\t3000\t+\tref\t10000\t0\t3000\t3000\t3000\t60"
        "\ttp:A:P\n"
        "read_2\t1500\t0\t1500\t+\tother\t9000\t0\t1500\t1500\t1500\t60"
        "\ttp:A:P\n"
    )
    out = io.StringIO()
    r = est_genome_yield(paf, seqsum, str(mm2), str(tmp_path / "idx"),
                         deplete=False, sim_speed=0.5, out=out)
    # control: on-target reads 0+1 = 5000 bp of 9000 total
    assert r["cnt_on_bp"] == pytest.approx(5000 / 1e6)
    assert r["cnt_total_bp"] == pytest.approx(9000 / 1e6)
    # sim: read_0 kept on-target (full 2000); read_1 ejected on-target:
    # salvage = bases/tmpl_dur * (est/450 + dl/4000 + ej - tmpl_delay)
    #         = 3000/3.8 * (450/450 + 400/4000 + 0.3 - 0.2), capped at 3000
    salv = min(3000.0, 3000 / 3.8 * (1.0 + 0.1 + 0.3 - 0.2))
    assert r["unc_on_bp"] == pytest.approx((2000 + salv) / 1e6 / 0.5)
    assert r["unc_total_bp"] == pytest.approx(r["unc_on_bp"])
    # deplete mode flips the target set
    r2 = est_genome_yield(paf, seqsum, str(mm2), str(tmp_path / "idx"),
                          deplete=True, out=io.StringIO())
    assert r2["cnt_on_bp"] == pytest.approx(1500 / 1e6)


def test_est_bed_yield(bed_inputs):
    paf, bed, seqsum = bed_inputs
    out = io.StringIO()
    r = est_bed_yield(paf, bed, seqsum, sim_speed=0.5, out=out)
    # control: on-target = 1000 (read_0 partial) + 1500 (read_2) = 2500 bp
    assert r["cnt_on_bp"] == pytest.approx(2500 / 1e6)
    assert r["cnt_total_bp"] == pytest.approx(9000 / 1e6)
    # kept read_0 contributes its BED bases on-target + rest off;
    # ejected read_1 contributes its salvage estimate off-target
    assert r["unc_on_bp"] > 0
    assert r["unc_total_bp"] > r["unc_on_bp"]
    text = out.getvalue()
    assert text.startswith("unc_on_bp\t")
    assert "cnt_total_bp" in text
