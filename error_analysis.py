#!/usr/bin/env python
"""Error-analysis web UI (replaces the reference's Dash app,
reference: error_analysis.py).

Reads one or TWO ``{split}_eval_analysis_{mode}.json`` files written by
``test.py --output_pred`` and serves an interactive per-rally view:
5-way type strips for both results with drop-frame verticals, a diff lane
marking frames where only one result errs, an FP1/FP2 pixel-error
histogram, and a frame preview with GT + both predicted trajectories.
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--analysis_file", type=str, required=True,
                    help="eval analysis JSON from test.py --output_pred")
    ap.add_argument("--analysis_file_2", type=str, default="",
                    help="second eval analysis JSON to compare against "
                    "(e.g. TrackNet-only vs +InpaintNet)")
    ap.add_argument("--data_dir", type=str, default="data")
    ap.add_argument("--port", type=int, default=8050)
    ap.add_argument("--host", type=str, default="127.0.0.1",
                    help="bind address (0.0.0.0 exposes the UI to the network)")
    args = ap.parse_args()

    from tracknetv3_tpu.tools.webui import serve

    serve(
        args.analysis_file,
        data_dir=args.data_dir,
        port=args.port,
        analysis_file_2=args.analysis_file_2 or None,
        host=args.host,
    )


if __name__ == "__main__":
    main()
