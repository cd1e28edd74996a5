"""Online HTTP serving entry point (beyond-reference).

Stands up a local OpenAI-completions-shaped endpoint over the
continuous-batching engine (serve/http.py): text requests POST
/v1/completions and are admitted into decode slots as they arrive —
multi-LoRA (`adapters`), speculation, sampling, and the engine's other
properties apply unchanged.  Standard library only (no fastapi/uvicorn
in the zero-egress image).

  python -m multimodal_unlearning_tpu.cli.serve_http \\
      model_family=llama2-7b model_path=... host=127.0.0.1 port=8000

  curl -s localhost:8000/v1/completions -d \\
      '{"prompt": "Who is Aurelia Kim?", "max_tokens": 64, "adapter": "npo"}'
"""

from __future__ import annotations

import time

from multimodal_unlearning_tpu.cli.serve import build_engine
from multimodal_unlearning_tpu.config import main as config_main
from multimodal_unlearning_tpu.config.registry import config_dir


def make_server(cfg):
    """Build the EngineServer (engine + chat-template codec) from config."""
    from multimodal_unlearning_tpu.serve.http import EngineServer

    engine, processor, kind, _ = build_engine(cfg)
    tok = processor.tokenizer

    def encode(text: str):
        return processor._encode_expand(processor.format(text, None, False))

    def decode(token_ids):
        return tok.decode(token_ids, skip_special_tokens=True)

    return EngineServer(
        engine, encode, decode,
        default_max_tokens=int(cfg.generation.max_new_tokens),
    )


def run(cfg):
    server = make_server(cfg)
    host, port = server.serve(
        host=str(cfg.get("host", "127.0.0.1")), port=int(cfg.get("port", 8000)))
    print(f"serving on http://{host}:{port}  "
          f"(POST /v1/completions, GET /v1/stats, /health)", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.shutdown()
    return server


main = config_main(config_dir() / "mm", "serve")(run)

if __name__ == "__main__":
    main()
