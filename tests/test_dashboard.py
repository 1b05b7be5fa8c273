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


def test_live_dashboard_server_reload(tmp_path):
    """Live-server parity with the reference Dash app
    (dash_grid_heatmaps.py:76-136): serve the tabs over HTTP, then hit
    the /reload endpoint after the files changed on disk and observe the
    re-rendered content - the re-read-and-rerender workflow a static
    export cannot provide."""
    import json
    import threading
    import urllib.request

    import numpy as np

    from geosongpu_tpu.plots.dashboard_server import DashboardServer

    rng = np.random.RandomState(3)
    a = {"pt": rng.randn(6, 8, 8).astype(np.float32)}
    b = {"pt": (a["pt"] + 0.1).astype(np.float32)}
    pa, pb = tmp_path / "ref.npz", tmp_path / "comp.npz"
    np.savez(pa, **a)
    np.savez(pb, **b)

    srv = DashboardServer(str(pa), str(pb), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.port}"
        page1 = urllib.request.urlopen(f"{url}/").read().decode()
        assert "REGENERATE" in page1 and "Difference" in page1
        assert page1.count("data:image/png;base64") == 3

        # change the data on disk, reload via the endpoint
        np.savez(pb, pt=(a["pt"] + 5.0).astype(np.float32))
        req = urllib.request.Request(f"{url}/reload", method="POST")
        resp = json.loads(urllib.request.urlopen(req).read())
        assert resp["ok"] and resp["reloads"] == 2
        page2 = urllib.request.urlopen(f"{url}/").read().decode()
        assert page2 != page1  # re-rendered from the new bytes
        status = json.loads(
            urllib.request.urlopen(f"{url}/status").read())
        assert status["reloads"] == 2
    finally:
        srv.shutdown()
