"""SGLang-class worker: the continuous-batching serving runtime.

The reference's sglang worker (llava/serve/sglang_worker.py) proxies the
worker protocol onto an sglang runtime whose core capability is continuous
batching — concurrent requests share one batched forward, with slots
admitted and recycled mid-flight. sglang has no TPU runtime; this worker
provides that capability natively: the same controller/worker HTTP protocol
as serve/model_worker.py, but generation runs through
`serve/batch_engine.BatchEngine` (slot-pool KV cache, per-request admission
via prefill-into-slot, one batched decode step per token).

Greedy outputs are bit-identical to the single-request path
(tests/test_batch_engine.py pins this).
"""

from __future__ import annotations

import argparse
import base64
import io
import json
from http.server import ThreadingHTTPServer

import numpy as np

from memory_augmented_vlm_tpu.data.tokenizer import tokenizer_image_token
from memory_augmented_vlm_tpu.serve.batch_engine import BatchEngine
from memory_augmented_vlm_tpu.serve.model_worker import ModelWorker
from memory_augmented_vlm_tpu.utils.logging import build_logger

logger = build_logger("sglang_worker")


class SGLangWorker(ModelWorker):
    """ModelWorker with the generate path swapped for the batch engine."""

    def __init__(self, *args, num_slots: int = 4, max_len: int = 4096,
                 kv_int8: bool = False, chunk_prefill: int = 0,
                 speculative: int = 0, decode_ticks: int = 1,
                 paged_page_size: int = 0, paged_pages: int = None,
                 **kwargs):
        super().__init__(*args, **kwargs)
        # kv_int8 halves the slot-pool cache footprint — the lever for more
        # concurrent long-video contexts per chip; chunk_prefill > 0 admits
        # long prompts one chunk per tick so active slots keep decoding;
        # decode_ticks=K runs K decode steps per dispatch (multi-step
        # scheduling for dispatch-bound hosts); paged_page_size/paged_pages
        # back the cache with a paged pool (block tables, oversubscription,
        # preemption, shared-prefix pages) (BatchEngine docstrings)
        self.engine = BatchEngine(self.model.params, self.model.cfg,
                                  num_slots=num_slots, max_len=max_len,
                                  kv_int8=kv_int8,
                                  chunk_prefill=chunk_prefill,
                                  speculative=speculative,
                                  decode_ticks=decode_ticks,
                                  paged_page_size=paged_page_size,
                                  paged_pages=paged_pages).start()

    def generate_stream(self, params: dict):
        self.queue_length += 1
        try:
            prompt = params["prompt"]
            ids = tokenizer_image_token(prompt, self.tokenizer)
            pixels = None
            modality = "text"
            images_b64 = params.get("images") or []
            if images_b64:
                from PIL import Image

                imgs = [Image.open(io.BytesIO(base64.b64decode(b)))
                        for b in images_b64]
                pixels = self.image_processor.preprocess(
                    imgs[0] if len(imgs) == 1 else np.stack(
                        [np.asarray(i.convert("RGB")) for i in imgs]))
                modality = "video" if len(imgs) > 1 else "image"
            embeds = self.model._row_embeds(
                np.asarray(ids, np.int64), pixels, modality, None)
            eos = self.tokenizer.convert_tokens_to_ids("<|im_end|>") \
                if self.tokenizer else 151645
            stop = params.get("stop")
            stops = ([stop] if isinstance(stop, str) else list(stop or []))
            stop_seqs = []
            if self.tokenizer:
                for s in stops:
                    tok = self.tokenizer.encode(s, add_special_tokens=False)
                    if tok:
                        stop_seqs.append(tuple(tok))
            top_p = params.get("top_p")
            out_q = self.engine.submit(
                np.asarray(embeds),
                max_new_tokens=int(params.get("max_new_tokens", 256)),
                eos_token_ids=(eos,),
                temperature=float(params.get("temperature", 0.0)),
                top_p=float(top_p) if top_p is not None else 1.0,
                stop_sequences=tuple(stop_seqs),
                # prompt TEXT ids seed the speculation lookup corpus
                draft_ids=tuple(int(t) for t in ids if t >= 0))
            text = ""
            all_tokens: list = []
            while True:
                chunk = out_q.get()
                if chunk is None:
                    break
                # cumulative decode: chunk-boundary-split multi-byte chars
                all_tokens.extend(int(t) for t in chunk)
                text = (self.tokenizer.decode(all_tokens,
                                              skip_special_tokens=True)
                        if self.tokenizer else str(all_tokens))
                hit = next((s for s in stops if s and s in text), None)
                if hit is not None:
                    text = text.split(hit)[0]
                    yield json.dumps({"text": prompt + text,
                                      "error_code": 0}).encode() + b"\0"
                    break
                yield json.dumps({"text": prompt + text,
                                  "error_code": 0}).encode() + b"\0"
        except Exception as e:  # noqa: BLE001
            yield json.dumps({"text": f"server error: {e}",
                              "error_code": 1}).encode() + b"\0"
        finally:
            self.queue_length -= 1


def main(argv=None):
    from memory_augmented_vlm_tpu.serve.model_worker import make_handler

    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=40001)
    p.add_argument("--controller-address", default="http://localhost:10000")
    p.add_argument("--worker-address", default=None)
    p.add_argument("--model-path", required=True)
    p.add_argument("--model-name", default=None)
    p.add_argument("--num-slots", type=int, default=4)
    p.add_argument("--max-len", type=int, default=4096)
    args = p.parse_args(argv)
    worker_addr = args.worker_address or f"http://localhost:{args.port}"
    worker = SGLangWorker(args.controller_address, worker_addr,
                          args.model_path, args.model_name,
                          num_slots=args.num_slots, max_len=args.max_len)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(worker))
    logger.info(f"sglang-class worker on {args.host}:{args.port} "
                f"({args.num_slots} slots)")
    server.serve_forever()


if __name__ == "__main__":
    main()
