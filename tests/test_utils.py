import json
import os

from geosongpu_tpu.utils.project_summary import distribution, read_backlog, \
    summary_plots
from geosongpu_tpu.utils.version_checks import compare_with_manifest, \
    save_manifest, stack_fingerprint


def test_stack_fingerprint_and_drift(tmp_path):
    fp = stack_fingerprint()
    assert "jax" in fp and "python" in fp
    p = str(tmp_path / "manifest.json")
    save_manifest(p)
    same, diffs = compare_with_manifest(p)
    assert same and not diffs
    # simulate drift
    with open(p) as f:
        d = json.load(f)
    d["jax"] = "0.0.1"
    with open(p, "w") as f:
        json.dump(d, f)
    same, diffs = compare_with_manifest(p)
    assert not same and any("jax" in x for x in diffs)


def test_project_summary(tmp_path):
    tsv = tmp_path / "backlog.tsv"
    tsv.write_text("Title\tStatus\tDomains\n"
                   "a\topen\tdycore\n"
                   "b\tdone\tdycore,physics\n"
                   "c\topen\t\n")
    rows = read_backlog(str(tsv))
    assert len(rows) == 3
    dist = distribution(rows, "Status")
    assert dist["open"] == 2 and dist["done"] == 1
    d2 = distribution(rows, "Domains")
    assert d2["dycore"] == 2 and d2["physics"] == 1 and d2["unset"] == 1
    out = summary_plots(str(tsv), out_png=str(tmp_path / "s.png"))
    assert os.path.isfile(out)
