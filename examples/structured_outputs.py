"""JSON-schema constrained generation example.

Role parity: reference examples/structured_outputs.py — that script needs
`outlines` for schema enforcement; this framework ships its own schema
automaton (mlx_vlm_tpu/structured.py), so the example is dependency-free.

Usage:
    python examples/structured_outputs.py --model /path/to/model \
        --image photo.jpg \
        --prompt "Extract the username and password from the image"
"""

import argparse
import json

from mlx_vlm_tpu import apply_chat_template, generate, load
from mlx_vlm_tpu.structured import (build_json_schema_logits_processor,
                                    make_constrained_sampler)

JSON_SCHEMA = {
    "type": "object",
    "properties": {
        "username": {"type": "string",
                     "description": "The username of the account"},
        "password": {"type": "string",
                     "description": "The password of the account"},
    },
    "required": ["username", "password"],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--image", default=None)
    p.add_argument("--prompt", default="Extract the account information "
                                       "from the image as JSON")
    p.add_argument("--schema", default=None,
                   help="JSON schema string (defaults to the demo schema)")
    p.add_argument("--max-tokens", type=int, default=256)
    args = p.parse_args()

    schema = json.loads(args.schema) if args.schema else JSON_SCHEMA
    model, processor = load(args.model)
    proc = build_json_schema_logits_processor(
        schema, getattr(processor, "tokenizer", processor))
    sampler = make_constrained_sampler(proc)

    prompt = apply_chat_template(
        processor, model.config_dict, args.prompt,
        num_images=1 if args.image else 0)
    result = generate(model, processor, prompt, image=args.image,
                      max_tokens=args.max_tokens, sampler=sampler,
                      verbose=False)
    text = result.text if hasattr(result, "text") else str(result)
    print(text)
    print("parsed:", json.dumps(json.loads(text), indent=2))


if __name__ == "__main__":
    main()
