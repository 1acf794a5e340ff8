#!/usr/bin/env python
"""Diff Rust-crate-emitted golden bytes against the repo's pinned sha256s.

Run `cargo run --release -- goldens/` inside tools/rust_goldens (needs the
crate's pinned nightly toolchain), then:

    python tools/check_rust_goldens.py goldens/

Exit 0 iff every config present in the dump directory hashes to the pin in
tests/golden_sweep_sha256.json (and reports any pinned config the dump is
missing). This closes the conformance chain: the pins were generated from
the NumPy oracle (no cargo in the build environment); this script makes the
"byte-identical to the Rust crate" claim machine-checkable.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys


def main(argv) -> int:
    dump_dir = argv[1] if len(argv) > 1 else "goldens"
    pins_path = os.path.join(os.path.dirname(__file__), "..", "tests",
                             "golden_sweep_sha256.json")
    with open(pins_path) as f:
        pins = json.load(f)

    bad, missing, ok = [], [], 0
    for key, want in sorted(pins.items()):
        path = os.path.join(dump_dir, f"{key.replace('_w', '_w')}.bin")
        if not os.path.exists(path):
            missing.append(key)
            continue
        with open(path, "rb") as f:
            got = hashlib.sha256(f.read()).hexdigest()
        if got != want:
            bad.append((key, want, got))
        else:
            ok += 1

    print(f"{ok}/{len(pins)} configs match", flush=True)
    for key in missing:
        print(f"MISSING {key}")
    for key, want, got in bad:
        print(f"MISMATCH {key}: pinned {want} got {got}")
    return 1 if bad or (ok == 0) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
