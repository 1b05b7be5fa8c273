import os

import numpy as np

from geosongpu_tpu.plots.dashboard import compare_dashboard


def test_compare_dashboard(tmp_path):
    rng = np.random.default_rng(0)
    ref = {"pt": rng.standard_normal((6, 8, 8, 4)).astype(np.float32),
           "ps": rng.standard_normal((6, 8, 8)).astype(np.float32),
           "scalar": np.float32(1.0)}  # non-field entries are skipped
    comp = {k: (v + 0.1 if hasattr(v, "shape") and v.ndim >= 3 else v)
            for k, v in ref.items()}
    out = compare_dashboard(ref, comp, str(tmp_path / "dash.html"))
    assert os.path.isfile(out)
    html = open(out).read()
    assert "Difference" in html and "Reference" in html
    assert html.count("data:image/png") == 6  # 2 vars x 3 tabs
