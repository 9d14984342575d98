"""Multi-host sharded inference example.

Role parity: reference examples/sharded_generate.py (mlx.launch + jaccl
backend); here the launcher is `jax.distributed` over ICI/DCN:

    # on every host of a TPU pod slice (GCE autodetects its coordinates):
    python examples/sharded_generate.py --model /path/to/model \
        --prompt 'Describe this image.' --image photo.jpg

    # or explicitly:
    python examples/sharded_generate.py --coordinator 10.0.0.1:8476 \
        --num-processes 2 --process-id $RANK --model ... --prompt ...
"""

import argparse
import sys

from mlx_vlm_tpu import apply_chat_template
from mlx_vlm_tpu.generate import stream_generate
from mlx_vlm_tpu.parallel import init_distributed, sharded_load


def main():
    parser = argparse.ArgumentParser("distributed inference example")
    parser.add_argument("--model", required=True,
                        help="path to a local model directory")
    parser.add_argument("--prompt", "-p", default="Describe this image.",
                        help="prompt ('-' reads from stdin)")
    parser.add_argument("--image", default=None)
    parser.add_argument("--max-tokens", type=int, default=256)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 (omit on GCE pods)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args()

    rank = init_distributed(args.coordinator,
                            num_processes=args.num_processes,
                            process_id=args.process_id)
    model, processor = sharded_load(args.model)

    prompt = args.prompt if args.prompt != "-" else sys.stdin.read()
    prompt = apply_chat_template(processor, model.config_dict, prompt,
                                 num_images=1 if args.image else 0)
    for chunk in stream_generate(model, processor, prompt, image=args.image,
                                 max_tokens=args.max_tokens,
                                 temperature=args.temperature):
        if rank == 0:
            print(chunk.text, end="", flush=True)
    if rank == 0:
        print()


if __name__ == "__main__":
    main()
