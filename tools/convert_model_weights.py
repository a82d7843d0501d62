"""Convert externally-exported model weights into the framework's archives.

The neural models (Silero VAD, RNNoise, DeepFilterNet3) run as native XLA
graphs whose parameters load from ``.npz`` archives validated against each
graph's key/shape contract (`models/*.py load_weights`). This tool converts
an externally-exported dump (a ``.npz``/``.npy`` dict saved from the
published ONNX/binary releases with your exporter of choice) by renaming
tensors through a JSON name map and verifying the result against the
target graph before writing.

Usage:
  python tools/convert_model_weights.py --model silero --list
  python tools/convert_model_weights.py --model rnnoise \\
      --source dump.npz --name-map map.json --output models/rnnoise.npz

The name map is ``{"framework_key": "source_key"}``; transposes are applied
automatically when the mapped tensor matches the expected shape reversed.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[1]
if str(_REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(_REPO_ROOT))


def _target_module(model: str):
    if model == "silero":
        from audioforge_tpu.models import silero as mod
    elif model == "rnnoise":
        from audioforge_tpu.models import rnnoise as mod
    elif model == "dfn3":
        from audioforge_tpu.models import dfn3 as mod
    else:
        raise SystemExit(f"unknown model {model!r} (silero|rnnoise|dfn3)")
    return mod


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True,
                        choices=("silero", "rnnoise", "dfn3"))
    parser.add_argument("--list", action="store_true",
                        help="print the target key/shape contract and exit")
    parser.add_argument("--source", type=Path)
    parser.add_argument("--name-map", type=Path,
                        help="JSON {framework_key: source_key}")
    parser.add_argument("--output", type=Path)
    parser.add_argument("--variant", choices=("ll", "standard"),
                        help="DFN3 latency variant tag stamped as "
                             "__variant__ metadata")
    args = parser.parse_args()

    mod = _target_module(args.model)
    reference = mod.init_params()

    if args.list:
        for key in sorted(reference):
            print(f"{key}: {tuple(reference[key].shape)}")
        return 0

    if not (args.source and args.output):
        parser.error("--source and --output are required unless --list")
    source = dict(np.load(args.source))
    if args.model == "dfn3" and not args.name_map:
        # DFN3 conversion is not a pure rename: the transposed-conv weights
        # are re-laid-out and flipped. The committed contract lives in
        # dfn3.TORCH_NAME_MAP + dfn3.convert_torch_state_dict.
        converted = mod.convert_torch_state_dict(source)
        meta = {"__provenance__": np.asarray("converted")}
        if args.variant:
            meta["__variant__"] = np.asarray(args.variant)
        args.output.parent.mkdir(parents=True, exist_ok=True)
        np.savez(args.output, **converted, **meta)
        mod.load_weights(args.output)  # final contract validation
        print(f"wrote {args.output} ({len(converted)} tensors, validated)")
        return 0
    if args.name_map:
        name_map = json.loads(args.name_map.read_text())
    elif hasattr(mod, "ONNX_NAME_MAP"):
        # the committed conversion contract (e.g. silero.ONNX_NAME_MAP):
        # framework key -> official checkpoint tensor name
        name_map = dict(mod.ONNX_NAME_MAP)
    else:
        name_map = {k: k for k in reference}

    converted = {}
    for key, ref in reference.items():
        src_key = name_map.get(key, key)
        if src_key not in source:
            print(f"missing source tensor for {key!r} (mapped {src_key!r})")
            return 1
        tensor = np.asarray(source[src_key], np.float32)
        if tensor.shape == tuple(ref.shape):
            converted[key] = tensor
        elif tensor.shape == tuple(ref.shape)[::-1] and tensor.ndim == 2:
            converted[key] = tensor.T
        else:
            print(
                f"shape mismatch for {key!r}: source {tensor.shape}, "
                f"expected {tuple(ref.shape)}"
            )
            return 1

    args.output.parent.mkdir(parents=True, exist_ok=True)
    np.savez(args.output, **converted)
    mod.load_weights(args.output)  # final contract validation
    print(f"wrote {args.output} ({len(converted)} tensors, validated)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
