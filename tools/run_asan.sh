#!/bin/sh
# ASan/UBSan sweep of the native parser over the test fixtures plus
# truncated and bit-flipped variants (SURVEY §5 sanitizers row; the
# parser eats corrupt bitstreams by design, so every mutation must
# parse without memory errors).  Exits nonzero on any finding.
set -e
cd "$(dirname "$0")/.."

BIN=${TMPDIR:-/tmp}/mpeg_asan
g++ -O1 -g -std=c++17 -fsanitize=address,undefined \
    -fno-sanitize-recover=all \
    native/asan_harness.cpp -o "$BIN"

run() {
    ASAN_OPTIONS=detect_leaks=0 "$BIN" "$1" "$2" > /dev/null
    echo "ok: $2 $1"
}

run tests/testdata/test.mpeg1video all
run tests/testdata/test.mp2 all
run tests/testdata/test.mpg all        # PS through the ES parsers: junk
[ -f bench_data/test1080.m1v ] && run bench_data/test1080.m1v all

# Mutations: truncations and bit flips at spread offsets.
MUT=${TMPDIR:-/tmp}/mpeg_asan_mut
python3 - "$MUT" <<'EOF'
import pathlib, sys
mut = pathlib.Path(sys.argv[1]); mut.mkdir(exist_ok=True)
for src in ["tests/testdata/test.mpeg1video", "tests/testdata/test.mp2",
            "tests/testdata/test.mpg"]:
    data = bytearray(pathlib.Path(src).read_bytes())
    stem = pathlib.Path(src).stem + pathlib.Path(src).suffix.replace(".", "_")
    for i, frac in enumerate([0.01, 0.1, 0.5, 0.9]):
        (mut / f"{stem}.trunc{i}").write_bytes(data[:int(len(data)*frac)])
    for i in range(16):
        d = bytearray(data)
        step = max(1, len(d) // 17)
        for off in range(step * (i + 1) % len(d), len(d), 7919):
            d[off] ^= 1 << (i % 8)
        (mut / f"{stem}.flip{i}").write_bytes(d)
EOF
for f in "$MUT"/*; do
    run "$f" all
done
echo "ASan/UBSan sweep: all clean"
