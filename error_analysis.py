#!/usr/bin/env python
"""Error-analysis web UI (replaces the reference's Dash app).

Reads the ``{split}_eval_analysis_{mode}.json`` written by
``test.py --output_pred`` and serves an interactive per-rally view:
5-way type strip chart, frame preview with GT/pred trajectories.
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--analysis_file", type=str, required=True,
                    help="eval analysis JSON from test.py --output_pred")
    ap.add_argument("--data_dir", type=str, default="data")
    ap.add_argument("--port", type=int, default=8050)
    args = ap.parse_args()

    from tracknetv3_tpu.tools.webui import serve

    serve(args.analysis_file, data_dir=args.data_dir, port=args.port)


if __name__ == "__main__":
    main()
