"""Dependency-free web UIs for error analysis and label correction.

Replaces the reference's Dash/plotly apps (reference: error_analysis.py,
correct_label.py) with a stdlib http.server + vanilla-JS canvas frontend
(plotly/dash are not available in this environment, and a zero-dependency
tool is easier to deploy next to a TPU pod anyway).

Both tools consume the ``{split}_eval_analysis_{mode}.json`` artifact
written by ``test.py --output_pred`` and the dataset frame images:

- error analysis: per-frame 5-way type strip chart over a rally for one or
  two results, frame preview with GT/pred trajectories on hover/click.
- label correction: click on the frame image to set a corrected
  coordinate; "Write Result" saves ``corrected_csv/{rally}_ball.csv``
  (reference contract: correct_label.py:187-206).
"""

from __future__ import annotations

import json
import os
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Dict, Optional

PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 body {{ font-family: sans-serif; margin: 16px; background:#111; color:#eee; }}
 select, button {{ font-size: 14px; margin: 4px; }}
 #strip {{ border: 1px solid #444; width: 100%; height: 90px; }}
 #frame {{ border: 1px solid #444; max-width: 100%; cursor: crosshair; }}
 .legend span {{ margin-right: 12px; }}
 .TP{{color:#6c6}} .TN{{color:#999}} .FP1{{color:#fa0}} .FP2{{color:#f66}} .FN{{color:#6af}}
</style></head>
<body>
<h3>{title}</h3>
<div>
 rally: <select id="rally"></select>
 frame: <span id="frameno">0</span>
 <span class="legend">
  <span class="TP">TP</span><span class="TN">TN</span><span class="FP1">FP1</span>
  <span class="FP2">FP2</span><span class="FN">FN</span></span>
 {extra_controls}
</div>
<canvas id="strip" width="1200" height="90"></canvas><br>
<canvas id="frame" width="960" height="540"></canvas>
<div id="info"></div>
<script>
const TYPES=["TP","TN","FP1","FP2","FN"];
const COLORS=["#6c6","#999","#fa0","#f66","#6af"];
const CORRECT_MODE={correct_mode};
let data=null, rally=null, cur=0, corrections={{}};
async function boot() {{
  data = await (await fetch('analysis.json')).json();
  const sel=document.getElementById('rally');
  Object.keys(data.pred_dict).forEach(k=>{{
    const o=document.createElement('option'); o.value=k; o.text=k; sel.add(o);
  }});
  sel.onchange=()=>{{rally=sel.value; cur=0; corrections={{}}; drawStrip(); showFrame(0);}};
  rally=sel.value; drawStrip(); showFrame(0);
}}
function pred() {{ return data.pred_dict[rally]; }}
function drawStrip() {{
  const c=document.getElementById('strip'), g=c.getContext('2d');
  g.clearRect(0,0,c.width,c.height);
  const p=pred(); const n=p.Type.length; const w=c.width/n;
  for (let i=0;i<n;i++) {{
    g.fillStyle=COLORS[p.Type[i]];
    g.fillRect(i*w, 10, Math.max(w,1), 60);
  }}
  if (corrections && Object.keys(corrections).length) {{
    g.fillStyle='#fff';
    for (const i of Object.keys(corrections)) g.fillRect(i*w, 72, Math.max(w,1), 8);
  }}
  g.fillStyle='#fff'; g.fillRect(cur*w, 0, Math.max(w,2), 8);
  c.onclick=(e)=>{{
    const i=Math.floor(e.offsetX/(c.clientWidth/n));
    showFrame(Math.min(Math.max(i,0),n-1));
  }};
}}
async function showFrame(i) {{
  cur=i; document.getElementById('frameno').textContent=i;
  const img=new Image();
  img.onload=()=>{{
    const c=document.getElementById('frame'), g=c.getContext('2d');
    c.width=img.width; c.height=img.height;
    g.drawImage(img,0,0);
    const p=pred();
    for (let k=Math.max(0,i-7);k<=i;k++) {{
      if (p.Visibility[k]) {{
        g.beginPath(); g.arc(p.X[k],p.Y[k],4,0,6.28);
        g.strokeStyle = k==i ? '#ff0':'#fa0'; g.lineWidth=2; g.stroke();
      }}
    }}
    if (p.X_GT) for (let k=Math.max(0,i-7);k<=i;k++) {{
      if (p.Visibility_GT[k]) {{
        g.beginPath(); g.arc(p.X_GT[k],p.Y_GT[k],4,0,6.28);
        g.strokeStyle=k==i?'#0f0':'#070'; g.lineWidth=2; g.stroke();
      }}
    }}
    const corr=corrections[i];
    if (corr) {{
      g.beginPath(); g.arc(corr[0],corr[1],6,0,6.28);
      g.strokeStyle='#f0f'; g.lineWidth=3; g.stroke();
    }}
    document.getElementById('info').textContent =
      `frame ${{i}} type=${{TYPES[p.Type[i]]}} pred=(${{p.X[i]}},${{p.Y[i]}}) vis=${{p.Visibility[i]}}`;
  }};
  img.src=`frame?rally=${{encodeURIComponent(rally)}}&i=${{i}}`;
  drawStrip();
}}
if (CORRECT_MODE) {{
  document.addEventListener('DOMContentLoaded', ()=>{{
    document.getElementById('frame').addEventListener('click', (e)=>{{
      const c=document.getElementById('frame');
      const x=Math.round(e.offsetX*c.width/c.clientWidth);
      const y=Math.round(e.offsetY*c.height/c.clientHeight);
      corrections[cur]=[x,y]; showFrame(cur);
    }});
    document.getElementById('write').onclick=async ()=>{{
      const r=await fetch('write', {{method:'POST', body:JSON.stringify({{rally:rally, corrections:corrections}})}});
      document.getElementById('info').textContent=await r.text();
      corrections={{}};
    }};
  }});
}}
document.addEventListener('keydown',(e)=>{{
  if (e.key==='ArrowRight') showFrame(Math.min(cur+1, pred().Type.length-1));
  if (e.key==='ArrowLeft') showFrame(Math.max(cur-1, 0));
}});
boot();
</script></body></html>
"""


class _Handler(BaseHTTPRequestHandler):
    analysis: Dict = {}
    data_dir: str = "data"
    title: str = "TrackNet analysis"
    correct_mode: bool = False

    def log_message(self, fmt, *args):  # quiet
        pass

    def _send(self, body: bytes, ctype="text/html"):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _rally_frame_path(self, rally_key: str, i: int) -> Optional[str]:
        match_id, rally_id = rally_key.split("_", 1)
        for split in ("test", "val", "train"):
            p = os.path.join(
                self.data_dir, split, f"match{match_id}", "frame", rally_id, f"{i}.png"
            )
            if os.path.exists(p):
                return p
        return None

    def do_GET(self):
        url = urllib.parse.urlparse(self.path)
        if url.path in ("/", "/index.html"):
            page = PAGE.format(
                title=self.title,
                correct_mode="true" if self.correct_mode else "false",
                extra_controls=(
                    '<button id="write">Write Result</button>' if self.correct_mode else ""
                ),
            )
            self._send(page.encode())
        elif url.path == "/analysis.json":
            self._send(json.dumps(self.analysis).encode(), "application/json")
        elif url.path == "/frame":
            q = urllib.parse.parse_qs(url.query)
            path = self._rally_frame_path(q["rally"][0], int(q["i"][0]))
            if path:
                with open(path, "rb") as f:
                    self._send(f.read(), "image/png")
            else:
                self.send_error(404)
        else:
            self.send_error(404)

    def do_POST(self):
        if self.path != "/write" or not self.correct_mode:
            self.send_error(404)
            return
        length = int(self.headers["Content-Length"])
        req = json.loads(self.rfile.read(length))
        rally_key = req["rally"]
        corrections = {int(k): v for k, v in req["corrections"].items()}
        match_id, rally_id = rally_key.split("_", 1)
        # Locate the rally's label csv and apply corrections.
        for split in ("test", "val", "train"):
            match_dir = os.path.join(self.data_dir, split, f"match{match_id}")
            if os.path.isdir(os.path.join(match_dir, "frame", rally_id)):
                break
        else:
            self.send_error(404)
            return
        from ..utils.io import label_csv_path, read_label_csv

        df = read_label_csv(label_csv_path(match_dir, rally_id))
        for i, (x, y) in corrections.items():
            df.loc[df["Frame"] == i, ["X", "Y", "Visibility"]] = [x, y, 1]
        out_dir = os.path.join(match_dir, "corrected_csv")
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, f"{rally_id}_ball.csv")
        df.to_csv(out, index=False)
        self._send(f"Wrote {len(corrections)} corrections to {out}".encode(), "text/plain")


def serve(
    analysis_file: str,
    data_dir: str = "data",
    port: int = 8050,
    correct_mode: bool = False,
    title: Optional[str] = None,
):
    with open(analysis_file) as f:
        analysis = json.load(f)
    handler = type(
        "Bound",
        (_Handler,),
        dict(
            analysis=analysis,
            data_dir=data_dir,
            correct_mode=correct_mode,
            title=title
            or ("Label correction" if correct_mode else "Error analysis"),
        ),
    )
    server = HTTPServer(("0.0.0.0", port), handler)
    print(f"Serving on http://localhost:{port}/ (Ctrl-C to stop)")
    server.serve_forever()
