"""Interactive segmentation demo (reference: label_anything/demo/nicegui.py
and demo/streamlit.py).

NiceGUI/Streamlit are not available in the TPU image, so the demo is a
self-contained stdlib ``http.server`` app: an HTML canvas UI for drawing
point / box / polygon prompts per class on support images, a JSON API that
assembles the episode (demo/preprocess equivalents) and runs
``generate_class_embeddings`` + ``predict`` on the TPU, and a colorized
overlay response.

Launch: ``label-anything-tpu app`` (or ``python -m labelanything_tpu.demo.app``).
"""

from __future__ import annotations

import base64
import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np
from PIL import Image

from ..typing import BatchKeys, ResultDict
from .preprocess import preprocess_support_set, preprocess_to_batch

PALETTE = [(0, 0, 0), (230, 60, 60), (60, 160, 230), (80, 200, 120),
           (240, 180, 40), (180, 90, 220), (90, 220, 210), (250, 120, 190)]

_PAGE = """<!doctype html>
<html><head><title>LabelAnything TPU demo</title><style>
body{font-family:sans-serif;margin:20px;background:#fafafa}
canvas{border:1px solid #888;cursor:crosshair}
.row{display:flex;gap:24px;flex-wrap:wrap}
button,select{margin:2px;padding:4px 10px}
.chip{display:inline-block;padding:2px 10px;border-radius:10px;color:#fff;margin:2px;cursor:pointer}
</style></head><body>
<h2>LabelAnything — TPU-native few-shot segmentation</h2>
<div class="row">
<div><h3>1. Support image + prompts</h3>
<input type="file" id="supfile" accept="image/*"><br>
<span id="chips"></span>
<select id="tool"><option value="point">positive point</option>
<option value="negpoint">negative point</option>
<option value="box">box</option><option value="poly">polygon</option></select>
<button onclick="undo()">undo</button>
<button onclick="finishPoly()">close polygon</button><br>
<canvas id="sup" width="480" height="480"></canvas></div>
<div><h3>2. Query image</h3>
<input type="file" id="qfile" accept="image/*"><br>
<button onclick="predict()" style="font-size:1.2em">Predict</button>
<div id="status"></div>
<canvas id="query" width="480" height="480"></canvas></div>
</div>
<script>
let classes = ["class 1","class 2","class 3"], active = 1;
let prompts = {}, polyBuf = [], supImg = null, qImg = null, supName=null, qName=null;
const palette = ["#000","#e63c3c","#3ca0e6","#50c878","#f0b428","#b45adc"];
function chips(){document.getElementById('chips').innerHTML = classes.map((c,i)=>
 `<span class="chip" style="background:${palette[i+1]};outline:${active==i+1?'3px solid #333':'none'}"
  onclick="active=${i+1};chips()">${c}</span>`).join('');}
chips();
function cv(id){return document.getElementById(id);}
function redraw(){const c=cv('sup'),x=c.getContext('2d');x.clearRect(0,0,480,480);
 if(supImg)x.drawImage(supImg,0,0,480,480);
 for(const cls in prompts){const P=prompts[cls];x.strokeStyle=x.fillStyle=palette[cls];
  (P.points||[]).forEach(p=>{x.beginPath();x.arc(p[0]/supImg.naturalWidth*480,p[1]/supImg.naturalHeight*480,4,0,7);
   p[2]>=0?x.fill():x.stroke();});
  (P.boxes||[]).forEach(b=>{x.strokeRect(b[0]/supImg.naturalWidth*480,b[1]/supImg.naturalHeight*480,
   (b[2]-b[0])/supImg.naturalWidth*480,(b[3]-b[1])/supImg.naturalHeight*480);});
  (P.polygons||[]).forEach(pg=>{x.beginPath();
   for(let i=0;i<pg.length;i+=2){const px=pg[i]/supImg.naturalWidth*480,py=pg[i+1]/supImg.naturalHeight*480;
    i?x.lineTo(px,py):x.moveTo(px,py);}x.closePath();x.stroke();});}
 if(polyBuf.length){x.strokeStyle=palette[active];x.beginPath();
  for(let i=0;i<polyBuf.length;i+=2){const px=polyBuf[i]/supImg.naturalWidth*480,py=polyBuf[i+1]/supImg.naturalHeight*480;
   i?x.lineTo(px,py):x.moveTo(px,py);}x.stroke();}}
function load(fileInput, cb){const f=fileInput.files[0];if(!f)return;
 const img=new Image();img.onload=()=>cb(img,f);img.src=URL.createObjectURL(f);}
document.getElementById('supfile').onchange=e=>load(e.target,(img,f)=>{supImg=img;supName=f;redraw();});
document.getElementById('qfile').onchange=e=>load(e.target,(img,f)=>{qImg=img;qName=f;
 const c=cv('query');c.getContext('2d').drawImage(img,0,0,480,480);});
cv('sup').onclick=e=>{if(!supImg)return;const r=cv('sup').getBoundingClientRect();
 const x=(e.clientX-r.left)/480*supImg.naturalWidth, y=(e.clientY-r.top)/480*supImg.naturalHeight;
 prompts[active]=prompts[active]||{points:[],boxes:[],polygons:[]};
 const tool=document.getElementById('tool').value;
 if(tool=='point')prompts[active].points.push([x,y,1]);
 else if(tool=='negpoint')prompts[active].points.push([x,y,-1]);
 else if(tool=='box'){if(window._boxStart){prompts[active].boxes.push(
   [Math.min(window._boxStart[0],x),Math.min(window._boxStart[1],y),
    Math.max(window._boxStart[0],x),Math.max(window._boxStart[1],y)]);window._boxStart=null;}
  else window._boxStart=[x,y];}
 else polyBuf.push(x,y);
 redraw();};
function finishPoly(){if(polyBuf.length>=6){prompts[active]=prompts[active]||{points:[],boxes:[],polygons:[]};
 prompts[active].polygons.push(polyBuf);}polyBuf=[];redraw();}
function undo(){const P=prompts[active];if(!P)return;
 if(polyBuf.length)polyBuf=[];else if(P.points.length)P.points.pop();
 else if(P.boxes.length)P.boxes.pop();else if(P.polygons.length)P.polygons.pop();redraw();}
async function b64(file){return new Promise(res=>{const r=new FileReader();
 r.onload=()=>res(r.result.split(',')[1]);r.readAsDataURL(file);});}
async function predict(){if(!supName||!qName){alert('load both images');return;}
 document.getElementById('status').textContent='running on TPU...';
 const body={support_image:await b64(supName),query_image:await b64(qName),
  prompts:prompts,num_classes:classes.length};
 const resp=await fetch('/predict',{method:'POST',body:JSON.stringify(body)});
 const out=await resp.json();
 if(out.error){document.getElementById('status').textContent='error: '+out.error;return;}
 document.getElementById('status').textContent='done';
 const img=new Image();img.onload=()=>cv('query').getContext('2d').drawImage(img,0,0,480,480);
 img.src='data:image/png;base64,'+out.overlay;}
</script></body></html>"""


_BUILTIN_PAGE = """<!doctype html>
<html><head><title>LabelAnything — episode browser</title><style>
body{font-family:sans-serif;margin:20px;background:#fafafa}
img{border:1px solid #888;max-width:320px;margin:4px}
button{margin:2px;padding:4px 10px}.cap{font-size:.85em;color:#444}
</style></head><body>
<h2>Built-in dataset episode browser</h2>
<p><a href="/">interactive demo</a> · models: <span id="models"></span></p>
<label>instances json <input id="inst" size="40"></label>
<label>img dir <input id="imgs" size="30"></label><br>
<label>ways <input id="ways" type="number" value="1" min="1" style="width:4em"></label>
<label>shots <input id="shots" type="number" value="1" min="1" style="width:4em"></label>
<label>image size <input id="size" type="number" value="480" step="32" style="width:5em"></label>
<label>fold <input id="fold" type="number" value="-1" min="-1" max="3" style="width:4em"></label>
<label>prompts <select id="ptypes" multiple size="3">
<option value="point" selected>point</option><option value="bbox" selected>bbox</option>
<option value="mask" selected>mask</option></select></label>
<button onclick="loadDs()">Load dataset</button>
<button onclick="sample()">Get sample</button>
<button onclick="predict()">Predict</button>
<a href="/builtin/download">Download results</a>
<div id="status"></div><div id="supports"></div><div id="results"></div>
<script>
async function post(url, body){const r=await fetch(url,{method:'POST',
 body:JSON.stringify(body||{})});return r.json();}
fetch('/models').then(r=>r.json()).then(m=>
 document.getElementById('models').textContent=m.models.join(', '));
function val(id){return document.getElementById(id).value;}
async function loadDs(){
 const ptypes=[...document.getElementById('ptypes').selectedOptions].map(o=>o.value);
 const out=await post('/builtin/load',{instances_path:val('inst'),img_dir:val('imgs'),
  n_ways:+val('ways'),n_shots:+val('shots'),image_size:+val('size'),
  fold:+val('fold'),prompt_types:ptypes});
 document.getElementById('status').textContent=out.error?('error: '+out.error):'dataset loaded';}
async function sample(){const out=await post('/builtin/sample');
 if(out.error){document.getElementById('status').textContent='error: '+out.error;return;}
 const d=document.getElementById('supports');
 d.innerHTML=`<h3>query (${out.dataset})</h3><img src="data:image/png;base64,${out.query}">`+
  '<h3>supports</h3>'+out.supports.map((s,i)=>
  `<span><img src="data:image/png;base64,${s.image}"><div class="cap">${s.classes.join(', ')}</div></span>`).join('');}
async function predict(){document.getElementById('status').textContent='running on TPU...';
 const out=await post('/builtin/predict');
 if(out.error){document.getElementById('status').textContent='error: '+out.error;return;}
 document.getElementById('status').textContent='binary IoU: '+out.binary_iou.toFixed(3);
 document.getElementById('results').innerHTML='<h3>results</h3>'+
  Object.entries(out.plots).map(([t,p])=>
  `<span><img src="data:image/png;base64,${p}"><div class="cap">${t}</div></span>`).join('');}
</script></body></html>"""


class DemoServer:
    def __init__(self, checkpoint: Optional[str] = None, image_size: int = 480):
        self.image_size = image_size
        self._model = None
        self._checkpoint = checkpoint
        self._lock = threading.Lock()
        self.browser = None  # EpisodeBrowser, created by /builtin/load

    # -- built-in episode browser endpoints (demo/builtin.py) ----------- #

    def builtin_load(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        from .builtin import EpisodeBrowser

        fold = int(payload.get("fold", -1))
        name = "val_coco20i" if fold >= 0 else "val_coco"
        params: Dict[str, Any] = {
            "instances_path": payload["instances_path"],
            "img_dir": payload.get("img_dir"),
        }
        if fold >= 0:
            params.update(val_fold_idx=fold, n_folds=4, split="val")
        if payload.get("num_samples"):
            params["num_samples"] = int(payload["num_samples"])
        image_size = int(payload.get("image_size", self.image_size))
        self.browser = EpisodeBrowser(
            {name: params},
            {"image_size": image_size, "seed": int(payload.get("seed", 42))},
            n_ways=int(payload.get("n_ways", 1)),
            n_shots=int(payload.get("n_shots", 1)),
            prompt_types=payload.get("prompt_types"),
        )
        return {"ok": True, "dataset": name}

    def _episode_forward(self, input_dict):
        import jax
        import jax.numpy as jnp

        la = self.model(num_classes=1)
        dev = {k: jax.tree.map(jnp.asarray, v)
               for k, v in input_dict.items()
               if k not in (BatchKeys.CLASSES, BatchKeys.IMAGE_IDS)}
        if not la.config.get("use_vit", False):
            dev[BatchKeys.EMBEDDINGS] = dev.pop(
                BatchKeys.IMAGES)[:, :, ::16, ::16, :]
        with self._lock:
            if la.params is None:
                la.init_params(dev)
            return la(dev)

    def builtin_sample(self) -> Dict[str, Any]:
        if self.browser is None:
            raise RuntimeError("load a dataset first (/builtin/load)")
        return self.browser.sample()

    def builtin_predict(self) -> Dict[str, Any]:
        if self.browser is None:
            raise RuntimeError("load a dataset first (/builtin/load)")
        return self.browser.predict(self._episode_forward)

    def model(self, num_classes: int):
        import jax
        import jax.numpy as jnp

        if self._model is None:
            from ..api import LabelAnything

            if self._checkpoint:
                self._model = LabelAnything.from_pretrained(self._checkpoint)
            else:
                # demo fallback: randomly initialized tiny SAM-encoder model
                from ..models.registry import model_registry

                la = LabelAnything({
                    "use_vit": False, "image_embed_dim": 3, "embed_dim": 64,
                    "image_size": self.image_size,
                    "class_encoder": {"name": "RandomMatrixEncoder",
                                      "bank_size": 100},
                })
                self._model = la
        return self._model

    def predict(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        import jax
        import jax.numpy as jnp

        sup = Image.open(io.BytesIO(
            base64.b64decode(payload["support_image"]))).convert("RGB")
        query = Image.open(io.BytesIO(
            base64.b64decode(payload["query_image"]))).convert("RGB")
        prompts = {int(k): v for k, v in payload["prompts"].items()}
        num_classes = int(payload.get("num_classes", max(prompts) if prompts else 1))

        support = preprocess_support_set([sup], [prompts], num_classes,
                                         self.image_size)
        qbatch = preprocess_to_batch(query, self.image_size)

        la = self.model(num_classes)
        with self._lock:
            if la.params is None:
                la.init_params(jax.tree.map(jnp.asarray, {
                    **support, BatchKeys.EMBEDDINGS: jnp.zeros(
                        (1, 2, self.image_size // 16, self.image_size // 16,
                         la.config.get("image_embed_dim", 3)))}))
            sup_dev = {k: jnp.asarray(v) for k, v in support.items()}
            # the demo fallback consumes strided pixels as embeddings
            if not la.config.get("use_vit", False):
                sup_dev[BatchKeys.EMBEDDINGS] = sup_dev.pop(
                    BatchKeys.IMAGES)[:, :, ::16, ::16, :]
            embs = la.generate_class_embeddings(sup_dev)
            q_dev = {k: jnp.asarray(v) for k, v in qbatch.items()}
            if not la.config.get("use_vit", False):
                q_dev[BatchKeys.EMBEDDINGS] = q_dev.pop(
                    BatchKeys.IMAGES)[:, :, ::16, ::16, :]
            seg = la.predict(q_dev, embs)
        pred = np.asarray(seg).argmax(axis=1)[0]

        overlay = np.asarray(
            query.resize((self.image_size, self.image_size))).copy()
        for cls in range(1, pred.max() + 1):
            color = np.asarray(PALETTE[cls % len(PALETTE)])
            sel = pred == cls
            overlay[sel] = (0.5 * overlay[sel] + 0.5 * color).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(overlay).save(buf, format="PNG")
        return {"overlay": base64.b64encode(buf.getvalue()).decode()}


def make_handler(server: DemoServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/builtin/download"):
                if server.browser is None:
                    self._send(404, b"no results yet", "text/plain")
                    return
                self._send(200, server.browser.download_zip(),
                           "application/zip")
            elif self.path.startswith("/builtin"):
                self._send(200, _BUILTIN_PAGE.encode(), "text/html")
            elif self.path.startswith("/models"):
                from .builtin import retrieve_models

                self._send(200, json.dumps(
                    {"models": retrieve_models()}).encode(),
                    "application/json")
            else:
                self._send(200, _PAGE.encode(), "text/html")

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length)) if length else {}
            try:
                if self.path.startswith("/builtin/load"):
                    result = server.builtin_load(payload)
                elif self.path.startswith("/builtin/sample"):
                    result = server.builtin_sample()
                elif self.path.startswith("/builtin/predict"):
                    result = server.builtin_predict()
                else:
                    result = server.predict(payload)
                code = 200
            except Exception as exc:  # surfaced to the UI
                result = {"error": f"{type(exc).__name__}: {exc}"}
                code = 500
            self._send(code, json.dumps(result).encode(), "application/json")

    return Handler


def launch(checkpoint: Optional[str] = None, port: int = 8777,
           image_size: int = 480, blocking: bool = True):
    server = DemoServer(checkpoint=checkpoint, image_size=image_size)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(server))
    print(f"LabelAnything demo listening on http://localhost:{port}")
    if blocking:
        httpd.serve_forever()
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd


if __name__ == "__main__":
    import sys

    launch(checkpoint=sys.argv[1] if len(sys.argv) > 1 else None)
