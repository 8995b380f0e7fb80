"""SGLang worker (reference: llava/serve/sglang_worker.py).

The reference proxies the worker protocol onto an external `sglang` runtime
endpoint. sglang has no TPU runtime and is not bundled in this image; this
module preserves the entry point and speaks the same worker protocol by
delegating to the native ModelWorker, so deployments scripted against
`python -m ...serve.sglang_worker` keep working on TPU.
"""

from __future__ import annotations

from memory_augmented_vlm_tpu.serve.model_worker import main as _native_main


def main(argv=None):
    try:
        import sglang  # noqa: F401

        print("sglang detected, but it has no TPU runtime; "
              "serving through the native TPU worker instead.")
    except ImportError:
        pass
    return _native_main(argv)


if __name__ == "__main__":
    main()
