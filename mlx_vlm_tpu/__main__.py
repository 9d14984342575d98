"""`python -m mlx_vlm_tpu <command>` — reference mlx_vlm/__main__.py:8-26."""

import importlib
import sys

_COMMANDS = {
    "generate": "mlx_vlm_tpu.generate.cli",
    "server": "mlx_vlm_tpu.server.cli",
    "convert": "mlx_vlm_tpu.convert",
    "chat": "mlx_vlm_tpu.chat",
    "lora": "mlx_vlm_tpu.lora",
    "detect": "mlx_vlm_tpu.generate.detection",
    "sft": "mlx_vlm_tpu.sft",
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in _COMMANDS:
        print(f"usage: python -m mlx_vlm_tpu {{{','.join(_COMMANDS)}}} ...")
        raise SystemExit(2)
    cmd = sys.argv.pop(1)
    mod = importlib.import_module(_COMMANDS[cmd])
    mod.main()


if __name__ == "__main__":
    main()
