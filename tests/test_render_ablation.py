"""tools/render_ablation.py rendering rules (advisor r4 + r5 additions):
data-driven provenance, chain breaks on missing rungs, oracle paragraph.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write(d, name, obj):
    with open(os.path.join(d, name), "w") as f:
        json.dump(obj, f)


def _report(rung, m, batch=None, **kw):
    r = {"rung": rung, "mAP_synth_val": m, "steps_per_s": 2.0,
         "ap_per_class": {str(c): 0.5 for c in range(1, 9)}, **kw}
    if batch:
        r["batch"] = batch
    return r


def _xval(rung, m, key=0.6, nonkey=0.5):
    return {"rung": rung, "mAP_synth_val": m, "mAP_key_frames": key,
            "mAP_nonkey_frames": nonkey,
            "mAP_by_offset": [round(m - 0.01 * o, 4) for o in range(12)]}


def _render(d):
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "render_ablation.py"),
         "--dir", d], capture_output=True, text=True, cwd=ROOT)
    assert r.returncode == 0, r.stderr
    return open(os.path.join(d, "ABLATION.md")).read()


def test_missing_rung_breaks_chain(tmp_path):
    d = str(tmp_path)
    _write(d, "report_rfcn.json", _report("rfcn", 0.65, "A"))
    _write(d, "report_mv_only.json", _report("mv_only", 0.51, "A"))
    # rnet missing entirely; small present — its delta must NOT chain
    _write(d, "report_small.json", _report("small", 0.52, "A"))
    md = _render(d)
    assert "(chain broken" in md
    # small's delta cell is empty (prev reset), not a number vs mv_only
    row = [l for l in md.splitlines() if l.startswith("| small ")][0]
    cells = [c.strip() for c in row.split("|")]
    assert cells[5] == ""


def test_provenance_computed_from_record(tmp_path):
    d = str(tmp_path)
    _write(d, "report_rfcn.json", _report("rfcn", 0.66, "B"))
    _write(d, "report_mv_only.json", _report("mv_only", 0.53, "A"))
    _write(d, "chain_of_record.json", {
        "git": "deadbee", "batch": "A",
        "mAP_synth_val": {"rfcn": 0.64, "mv_only": 0.50, "rnet": 0.51}})
    md = _render(d)
    assert "git deadbee" in md
    # the retrain move is computed: rfcn 0.66 vs record 0.64 -> +0.0200
    assert "+0.0200 vs record" in md
    # module delta computed from the record chain (rnet - mv_only)
    assert "+0.0100" in md


def test_oracle_paragraph(tmp_path):
    d = str(tmp_path)
    for rung, m in (("rfcn", 0.65), ("mv_only", 0.50), ("oracle", 0.62)):
        _write(d, f"report_{rung}.json", _report(rung, m, "A"))
        _write(d, f"report_{rung}_xval.json", _xval(rung, m))
    md = _render(d)
    assert "Oracle bound" in md
    # closes (0.62-0.50)/(0.65-0.50) = 80% of the gap
    assert "80%" in md
    # oracle rung row compares vs mv_only, outside the module chain
    row = [l for l in md.splitlines() if l.startswith("| oracle ")][0]
    assert "vs mv_only" in row
    # offset table renders
    assert "Offset-resolved decay" in md


def test_doubled_budget_table(tmp_path):
    d = str(tmp_path)
    _write(d, "report_mv_only.json", _report("mv_only", 0.51, "A"))
    _write(d, "report_mv_only_xval.json", _xval("mv_only", 0.52))
    _write(d, "report_mv_only_xval9k.json", _xval("mv_only", 0.55))
    md = _render(d)
    assert "Doubled training budget" in md
    assert "+0.0300" in md
