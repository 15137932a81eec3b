#!/usr/bin/env python
"""Interactive label-correction web UI (replaces the reference's Dash app).

Same rally/frame browser as error_analysis.py; click the frame image to
set a corrected ball coordinate, then "Write Result" saves
``corrected_csv/{rally}_ball.csv`` into the dataset
(reference contract: correct_label.py:187-206).
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--analysis_file", type=str, required=True,
                    help="eval analysis JSON from test.py --output_pred")
    ap.add_argument("--data_dir", type=str, default="data")
    ap.add_argument("--port", type=int, default=8051)
    ap.add_argument("--host", type=str, default="127.0.0.1",
                    help="bind address (0.0.0.0 exposes the label-write "
                    "endpoint to the network)")
    args = ap.parse_args()

    from tracknetv3_tpu.tools.webui import serve

    serve(args.analysis_file, data_dir=args.data_dir, port=args.port,
          correct_mode=True, host=args.host)


if __name__ == "__main__":
    main()
