"""Interface-generator CLI (parity:
/root/reference/src/tcn/py_ftn_interface/cli.py:80-136: YAML in, generated
bridge sources + build fragment out)."""
from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="geosongpu-tpu-interop")
    p.add_argument("definition", help="YAML interface definition")
    p.add_argument("target_dir", help="output directory")
    args = p.parse_args(argv)

    from .generator import Bridge

    bridge = Bridge.from_yaml(args.definition)
    files = bridge.write(args.target_dir)
    for name, path in sorted(files.items()):
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
