//! Dump the actual Rust crate's packed bytes for the conformance sweep so
//! the pins in tests/golden_sweep_sha256.json become machine-checkable
//! against the reference implementation itself (no cargo exists in the
//! build environment, so the pins were generated from the NumPy oracle —
//! four independent implementations agree on them).
//!
//! Input per (dtype, width): values[i] = i % (1 << (W % T)) — the crate's
//! own exhaustive-sweep pattern (fastlanes src/bitpacking.rs:281).
//! Output: one little-endian byte file `<dtype>_w<width>.bin` per config
//! under the directory given as argv[1] (default `goldens/`).
//!
//! Usage:  cargo run --release -- goldens/
//! Then:   python tools/check_rust_goldens.py goldens/

use fastlanes::BitPacking;
use std::fs;
use std::io::Write;

macro_rules! dump {
    ($t:ty, $name:literal, $bits:expr, $dir:expr) => {{
        let t: usize = $bits;
        for w in 0..=t {
            let modulus: u128 = 1u128 << (w % t);
            let mut input = [0 as $t; 1024];
            for i in 0..1024 {
                input[i] = ((i as u128) % modulus) as $t;
            }
            let mut packed = vec![0 as $t; 1024 * w / t];
            unsafe { <$t as BitPacking>::unchecked_pack(w, &input, &mut packed) };
            let mut bytes = Vec::with_capacity(packed.len() * (t / 8));
            for word in &packed {
                bytes.extend_from_slice(&word.to_le_bytes());
            }
            let path = format!("{}/{}_w{}.bin", $dir, $name, w);
            fs::File::create(&path)
                .and_then(|mut f| f.write_all(&bytes))
                .unwrap_or_else(|e| panic!("writing {path}: {e}"));
            println!("{path}");
        }
    }};
}

fn main() {
    let dir = std::env::args().nth(1).unwrap_or_else(|| "goldens".to_string());
    fs::create_dir_all(&dir).expect("create output dir");
    dump!(u8, "u8", 8, &dir);
    dump!(u16, "u16", 16, &dir);
    dump!(u32, "u32", 32, &dir);
    dump!(u64, "u64", 64, &dir);
}
