"""Command-line tool (parity: reference examples/flate.rs).

Subcommands: copy, byte-read, gzip-decode, gzip-decode-multi,
gzip-encode, zlib-decode, zlib-encode — plus the TPU-native extras
pgzf-encode / pgzf-decode.  "-" means stdin/stdout; /dev/null works as
an output sink.
"""
from __future__ import annotations

import argparse
import sys


def _read_input(path: str) -> bytes:
    if path == "-":
        return sys.stdin.buffer.read()
    with open(path, "rb") as f:
        return f.read()


def _write_output(path: str, data: bytes) -> None:
    if path == "-":
        sys.stdout.buffer.write(data)
        sys.stdout.buffer.flush()
    else:
        with open(path, "wb") as f:
            f.write(data)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="libflate-tpu",
        description="TPU-native DEFLATE/GZIP/ZLIB codec tool")
    p.add_argument("-i", "--input", default="-")
    p.add_argument("-o", "--output", default="-")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--engine", default=None,
                   help="serial | native | tpu | auto")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("copy")
    br = sub.add_parser("byte-read")
    br.add_argument("--unit", type=int, default=1)
    sub.add_parser("gzip-decode")
    sub.add_parser("gzip-decode-multi")
    sub.add_parser("gzip-encode")
    sub.add_parser("zlib-decode")
    sub.add_parser("zlib-encode")
    pe = sub.add_parser("pgzf-encode")
    pe.add_argument("--member-size", type=int, default=64 * 1024)
    sub.add_parser("pgzf-decode")

    args = p.parse_args(argv)
    data = _read_input(args.input)

    from .formats import gzip as fgzip, pgzf, zlib as fzlib

    if args.cmd == "copy":
        out = data
    elif args.cmd == "byte-read":
        # parity: reads input unit bytes at a time, discards (throughput
        # probe); output is empty
        unit = max(1, args.unit)
        for _ in range(0, len(data), unit):
            pass
        out = b""
    elif args.cmd == "gzip-decode":
        dec = fgzip.Decoder(data, engine=args.engine)
        if args.verbose:
            print(f"header: {dec.header}", file=sys.stderr)
        out = dec.read()
    elif args.cmd == "gzip-decode-multi":
        out = fgzip.decompress(data, engine=args.engine, multi=True)
    elif args.cmd == "gzip-encode":
        out = fgzip.compress(data, engine=args.engine)
    elif args.cmd == "zlib-decode":
        dec = fzlib.Decoder(data, engine=args.engine)
        if args.verbose:
            print(f"header: {dec.header}", file=sys.stderr)
        out = dec.read()
    elif args.cmd == "zlib-encode":
        out = fzlib.compress(data, engine=args.engine)
    elif args.cmd == "pgzf-encode":
        out = pgzf.compress(data, member_size=args.member_size,
                            engine=args.engine)
    elif args.cmd == "pgzf-decode":
        out = pgzf.decompress(data, engine=args.engine)
    else:  # pragma: no cover
        p.error(f"unknown command {args.cmd}")

    _write_output(args.output, out)
    return 0


def run() -> int:
    """Entry point with clean one-line error reporting."""
    try:
        return main()
    except BrokenPipeError:
        return 0
    except (ValueError, OSError, EOFError, KeyError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(run())
