"""Generate a JSON schema + markdown docs for the yaml config.

Parity with reference `ci/pre_commit/generate_schema.py:1-55` (marshmallow →
JSON-schema → md); here derived from the dataclass layout in config.py.
"""
import json
import sys
from pathlib import Path

SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "title": "mcquic_tpu config",
    "type": "object",
    "additionalProperties": False,
    "required": ["model"],
    "properties": {
        "model": {
            "type": "object",
            "additionalProperties": False,
            "required": ["key"],
            "properties": {
                "key": {"type": "string", "description": "Model registry key (Compressor | Neon | GeneratorV3SelfAttention | GeneratorVAR)"},
                "params": {"type": "object", "description": "Ctor kwargs for the model"},
            },
        },
        "train": {
            "type": "object",
            "additionalProperties": False,
            "required": ["totalStep", "batchSize", "epoch", "valFreq", "trainSet",
                         "valSet", "saveDir", "target", "optim", "schdr"],
            "properties": {
                "totalStep": {"type": "integer"},
                "batchSize": {"type": "integer", "description": "per data-parallel shard"},
                "epoch": {"type": "integer"},
                "valFreq": {"type": "integer"},
                "trainSet": {"type": "string", "description": "tar-shard glob or image folder"},
                "valSet": {"type": "string"},
                "saveDir": {"type": "string"},
                "target": {"type": "string", "description": "Loss registry key (MsSSIM | PSNR)"},
                "optim": {"type": "object", "properties": {"key": {"type": "string"}, "params": {"type": "object"}}},
                "schdr": {"type": "object", "properties": {"key": {"type": "string"}, "params": {"type": "object"}}},
                "gpu": {"type": "object", "properties": {"gpus": {"type": "integer"},
                                                          "vRam": {"type": "integer"},
                                                          "wantsMore": {"type": "boolean"}}},
                "hooks": {"type": "array", "items": {"type": "object"}},
                "externalLib": {"type": "array", "items": {"type": "string"}},
                "cropSize": {"type": "integer", "description": "square training crop edge; default derives from the model (Neon size[0]*16, v1 512)"},
            },
        },
    },
}


def markdown() -> str:
    lines = ["# Config schema", ""]

    def walk(props, prefix=""):
        for name, spec in props.items():
            desc = spec.get("description", "")
            lines.append(f"- `{prefix}{name}` ({spec.get('type', 'any')}): {desc}")
            if spec.get("type") == "object" and "properties" in spec:
                walk(spec["properties"], prefix=f"{prefix}{name}.")

    walk(SCHEMA["properties"])
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    outDir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("configs")
    (outDir / "schema.json").write_text(json.dumps(SCHEMA, indent=2))
    (outDir / "schema.md").write_text(markdown())
    print(f"wrote {outDir}/schema.json and schema.md")
