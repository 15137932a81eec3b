"""Two-result error-analysis web UI: endpoints, drop-frame data, diff hist.

Drives the stdlib HTTP server over tiny fixtures (the UI's contract with
test.py's eval-analysis JSON artifact; reference feature being replicated:
error_analysis.py's side-by-side comparison with drop-frame verticals)."""

import json
import os
import threading
import urllib.request
from http.server import HTTPServer

import numpy as np
import pytest

from tracknetv3_tpu.tools.webui import make_handler


def _analysis(seed):
    rng = np.random.default_rng(seed)
    n = 12
    return {
        "pred_dict": {
            "1_1_00_00": {
                "Frame": list(range(n)),
                "X": rng.integers(0, 100, n).tolist(),
                "Y": rng.integers(0, 100, n).tolist(),
                "Visibility": [1] * n,
                "Type": rng.integers(0, 5, n).tolist(),
                "X_GT": rng.integers(0, 100, n).tolist(),
                "Y_GT": rng.integers(0, 100, n).tolist(),
                "Visibility_GT": [1] * n,
            }
        }
    }


@pytest.fixture()
def server(tmp_path):
    a1 = tmp_path / "a1.json"
    a2 = tmp_path / "a2.json"
    a1.write_text(json.dumps(_analysis(1)))
    a2.write_text(json.dumps(_analysis(2)))
    data_dir = tmp_path / "data"
    os.makedirs(data_dir)
    (data_dir / "drop_frame.json").write_text(
        json.dumps({"start": {"1_1_00_00": 2}, "end": {"1_1_00_00": 9}})
    )
    handler = make_handler(str(a1), str(a2), data_dir=str(data_dir))
    srv = HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, r.read()


def test_two_result_endpoints(server):
    status, body = _get(f"{server}/")
    assert status == 200 and b"strip2" in body and b"diff" in body
    for ep in ("analysis.json", "analysis2.json", "labels.json", "dropframe.json"):
        status, body = _get(f"{server}/{ep}")
        assert status == 200, ep
        json.loads(body)
    _, drop = _get(f"{server}/dropframe.json")
    assert json.loads(drop)["start"]["1_1_00_00"] == 2
    _, lbls = _get(f"{server}/labels.json")
    assert json.loads(lbls) == ["a1.json", "a2.json"]


def test_diff_hist_renders_png(server):
    status, body = _get(f"{server}/diff_hist.png")
    assert status == 200
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_single_result_404s_second(tmp_path):
    a1 = tmp_path / "a1.json"
    a1.write_text(json.dumps(_analysis(1)))
    handler = make_handler(str(a1), None, data_dir=str(tmp_path))
    srv = HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        assert _get(f"{base}/analysis.json")[0] == 200
        with pytest.raises(urllib.error.HTTPError):
            _get(f"{base}/analysis2.json")
    finally:
        srv.shutdown()


def test_correct_label_write_path(tmp_path):
    """Label-correction POST applies clicked corrections to the rally CSV
    (reference contract: correct_label.py:187-206)."""
    import pandas as pd

    a1 = tmp_path / "a1.json"
    a1.write_text(json.dumps(_analysis(1)))
    data_dir = tmp_path / "data"
    rally = data_dir / "test" / "match1" / "frame" / "1_00_00"
    csvd = data_dir / "test" / "match1" / "csv"
    os.makedirs(rally)
    os.makedirs(csvd)
    pd.DataFrame(
        {"Frame": range(5), "Visibility": [1] * 5, "X": [9] * 5, "Y": [9] * 5}
    ).to_csv(csvd / "1_00_00_ball.csv", index=False)

    handler = make_handler(str(a1), None, data_dir=str(data_dir), correct_mode=True)
    srv = HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        body = json.dumps(
            {"rally": "1_1_00_00", "corrections": {"2": [42, 17]}}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_port}/write", data=body, method="POST"
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        out = pd.read_csv(
            data_dir / "test" / "match1" / "corrected_csv" / "1_00_00_ball.csv"
        )
        row = out[out.Frame == 2].iloc[0]
        assert (row.X, row.Y, row.Visibility) == (42, 17, 1)
        assert (out[out.Frame == 1].iloc[0].X) == 9  # untouched rows intact
    finally:
        srv.shutdown()


def test_correct_label_preserves_extra_columns(tmp_path):
    """Corrections must not destroy non-numeric annotation columns: the
    pandas-free CSV path keeps unparseable cells verbatim."""
    import pandas as pd

    a1 = tmp_path / "a1.json"
    a1.write_text(json.dumps(_analysis(1)))
    data_dir = tmp_path / "data"
    rally = data_dir / "test" / "match1" / "frame" / "1_00_00"
    csvd = data_dir / "test" / "match1" / "csv"
    os.makedirs(rally)
    os.makedirs(csvd)
    pd.DataFrame(
        {
            "Frame": range(4),
            "Visibility": [1] * 4,
            "X": [9] * 4,
            "Y": [9] * 4,
            "Note": ["serve", "rally", "", "smash"],
        }
    ).to_csv(csvd / "1_00_00_ball.csv", index=False)

    handler = make_handler(str(a1), None, data_dir=str(data_dir), correct_mode=True)
    srv = HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        body = json.dumps(
            {"rally": "1_1_00_00", "corrections": {"1": [50, 60]}}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_port}/write", data=body, method="POST"
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        out = pd.read_csv(
            data_dir / "test" / "match1" / "corrected_csv" / "1_00_00_ball.csv"
        )
        # blank -> 0 mirrors read_label_csv's fillna(0); the mixed column
        # re-reads it as the string "0"
        assert list(out.Note.fillna(0)) == ["serve", "rally", "0", "smash"]
        row = out[out.Frame == 1].iloc[0]
        assert (row.X, row.Y) == (50, 60)
    finally:
        srv.shutdown()
