"""Serving app — Gradio UI when available, stdlib JSON HTTP otherwise.

Reference: ui/gradio_app/app.py (form with 9 dropdowns mirroring the
standardizer encodings, threshold-mode selector, per-stream probability
table, processed-image preview, performance dashboard reading
results/stack_v2/summary.json with hard-coded fallback metrics
(app.py:157-214)). gradio is not installed in this image, so the same
service is also exposed as a plain HTTP JSON API (POST /predict with a
base64 image + fields) — the UI layer is a thin shell either way because
all logic lives in mmtrs_tpu.serve.service.
"""

from __future__ import annotations

import base64
import io
import json
from pathlib import Path

import numpy as np

from mmtrs_tpu.serve.choices import CHOICES_MAP, DEFAULTS, FIELD_ORDER, THRESHOLD_MODES
from mmtrs_tpu.serve.service import PredictService

FALLBACK_METRICS = {  # app.py:157-214 hard-coded fallback dashboard values
    "test": {"auc": 0.8695, "acc": 0.8223, "prec": 0.8192, "rec": 0.9062, "f1": 0.8605},
    "thr": 0.4703,
}


def load_overall_metrics(results_dir: str | Path = "results/stack_v2") -> dict:
    p = Path(results_dir) / "summary.json"
    if p.exists():
        try:
            return json.loads(p.read_text())
        except Exception:
            pass
    return FALLBACK_METRICS


def _decode_image(b64: str) -> np.ndarray:
    from PIL import Image

    raw = base64.b64decode(b64)
    return np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))


def serve_http(service: PredictService, host: str = "127.0.0.1", port: int = 7860):
    """Minimal JSON API: GET / → form schema + dashboard; POST /predict."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj):
            body = json.dumps(obj, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            self._send(
                200,
                {
                    "fields": {k: list(v) for k, v in CHOICES_MAP.items()},
                    "threshold_modes": THRESHOLD_MODES,
                    "metrics": load_overall_metrics(),
                },
            )

        def do_POST(self):
            if self.path != "/predict":
                return self._send(404, {"error": "unknown endpoint"})
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n))
                img = _decode_image(req["image_b64"])
                out = service.predict_one(
                    img,
                    fields=req.get("fields"),
                    thr_mode=req.get("thr_mode", "max_f1"),
                    threshold=req.get("threshold"),
                )
                out.pop("processed_image", None)
                self._send(200 if "error" not in out else 400, out)
            except Exception as e:  # pragma: no cover
                self._send(500, {"error": str(e)})

        def log_message(self, *a):  # quiet
            pass

    httpd = HTTPServer((host, port), Handler)
    print(f"serving on http://{host}:{port}")
    httpd.serve_forever()


def build_gradio_app(service: PredictService):  # pragma: no cover - needs gradio
    import gradio as gr

    metrics = load_overall_metrics()

    def predict(image, thr_mode, *field_values):
        fields = {k: (v or None) for k, v in zip(FIELD_ORDER, field_values)}
        out = service.predict_one(np.asarray(image), fields, thr_mode=thr_mode)
        if "error" in out:
            return out["error"], None, None
        table = [[k, f"{v:.4f}"] for k, v in out["streams"].items()]
        proc = out.pop("processed_image")
        return (
            f"{out['label']} (p={out['p_indirect']:.3f}, thr={out['threshold']:.3f})",
            table,
            proc.astype(np.uint8),
        )

    with gr.Blocks(title="Tooth Restoration Selection (TPU)") as demo:
        gr.Markdown(
            f"## Direct vs. Indirect restoration\n"
            f"Test AUC {metrics['test']['auc']} · Acc {metrics['test']['acc']}"
        )
        with gr.Row():
            img = gr.Image(label="Tooth photograph")
            with gr.Column():
                dds = [
                    gr.Dropdown(choices=[""] + list(CHOICES_MAP[k]), label=k, value="")
                    for k in FIELD_ORDER
                ]
                mode = gr.Dropdown(choices=THRESHOLD_MODES, value="max_f1",
                                   label="threshold mode")
        btn = gr.Button("Preprocess & Predict")
        out_label = gr.Textbox(label="Prediction")
        out_table = gr.Dataframe(headers=["stream", "probability"])
        out_img = gr.Image(label="Processed image")
        btn.click(predict, [img, mode] + dds, [out_label, out_table, out_img])
    return demo


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--weights", default="weights")
    args = p.parse_args(argv)

    from mmtrs_tpu.serve.ensembles import build_service_from_weights

    service = build_service_from_weights(args.weights)
    try:  # pragma: no cover
        app = build_gradio_app(service)
        app.launch(server_name=args.host, server_port=args.port)
    except ImportError:
        serve_http(service, args.host, args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
