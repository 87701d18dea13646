// ASan/UBSan harness for the native parser (SURVEY §5 sanitizers row).
//
// Drives every C-ABI entry point over a stream supplied on the command
// line: blob prepare/counts/emit, dense parse, host decode, and the MP2
// parser — the same call sequences the Python bindings make.  Build:
//
//   g++ -O1 -g -std=c++17 -fsanitize=address,undefined \
//       native/asan_harness.cpp -o /tmp/mpeg_asan
//   /tmp/mpeg_asan <file.m1v|file.mp2> [mode]
//
// mode: blob (default) | dense | host | audio | all
// tools/run_asan.sh runs it over the test fixtures plus truncated and
// bit-flipped variants.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "parser.cpp"

static std::vector<uint8_t> read_file(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) { perror(path); exit(2); }
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(n);
    if (fread(buf.data(), 1, n, f) != (size_t)n) { perror("read"); exit(2); }
    fclose(f);
    return buf;
}

static int run_blob(const std::vector<uint8_t>& data) {
    void* p = vp_create();
    vp_feed(p, data.data(), (int64_t)data.size());
    vp_signal_end(p);
    if (!vp_has_header(p)) { vp_destroy(p); return 0; }
    int mb = ((vp_width(p) + 15) >> 4) * ((vp_height(p) + 15) >> 4);
    std::vector<int16_t> mvh(mb), mvv(mb);
    std::vector<uint16_t> nbcls(mb);
    std::vector<uint8_t> misc(mb);
    int pics = 0;
    // Hop-record bound: each emit below starts a fresh chain (prev 0)
    // at a base up to 7 * pic_span, so the gap can span 8 pictures.
    int64_t hb = ((int64_t)8 * mb * 6 * 64 >> 16) + 2;
    while (vp_parse_blob_prepare(p) != 0) {
        int64_t counts[2];
        vp_blob_counts(p, counts);
        std::vector<uint16_t> mi(2 * (counts[0] + hb));
        std::vector<uint16_t> ei(counts[1] + hb);
        std::vector<int32_t> ev(counts[1] + hb);
        int64_t io[4] = {0, 0, 0, 0};
        vp_blob_emit(p, mi.data(), ei.data(), ev.data(),
                     mvh.data(), mvv.data(), nbcls.data(), misc.data(),
                     (int64_t)(pics % 8) * mb * 6 * 64, io);
        pics++;
    }
    vp_destroy(p);
    return pics;
}

// Whole-window path incl. the pool-growth protocol (small initial
// capacity so pending/regrow exercises on every real stream).
static int run_window(const std::vector<uint8_t>& data) {
    void* p = vp_create();
    vp_feed(p, data.data(), (int64_t)data.size());
    vp_signal_end(p);
    if (!vp_has_header(p)) { vp_destroy(p); return 0; }
    int64_t mb = ((vp_width(p) + 15) >> 4) * ((vp_height(p) + 15) >> 4);
    const int64_t W = 8;
    int64_t km = 64, ke = 1;
    int pics = 0;
    const int64_t slack = (W * mb * 6 * 64 >> 16) + W + 2;   // hop bound
    for (;;) {
        int64_t w_done = 0, nm = 0, ne = 0, pm = 0, pe = 0;
        for (;;) {
            std::vector<uint16_t> mi(2 * km);
            std::vector<uint16_t> ei(ke);
            std::vector<int32_t> ev(ke);
            std::vector<int16_t> mvh(W * mb), mvv(W * mb);
            std::vector<uint16_t> nbc(W * mb);
            std::vector<uint8_t> msc(W * mb);
            std::vector<int32_t> flags(W), types(W);
            int64_t out[5];
            // NOTE: arrays are re-zeroed per growth retry here (the real
            // caller copies the partial window across); emitted records
            // stay consumed either way, which is what the sweep checks.
            w_done += vp_blob_window(p, w_done, W, km, ke, nm, ne,
                                     km, ke,   // fresh buffers: full pad
                                     pm, pe,
                                     mi.data(), ei.data(),
                                     ev.data(), mvh.data(), mvv.data(),
                                     nbc.data(), msc.data(), flags.data(),
                                     types.data(), mb, out);
            nm = out[0];
            ne = out[1];
            pm = out[3];
            pe = out[4];
            if (out[2] == 0 || w_done >= W) break;
            int64_t counts[2];
            vp_blob_counts(p, counts);
            while (nm + counts[0] + slack > km) km *= 2;
            while (ne + counts[1] + slack > ke) ke *= 2;
        }
        if (w_done == 0) break;
        pics += (int)w_done;
    }
    vp_destroy(p);
    return pics;
}

static int run_dense(const std::vector<uint8_t>& data) {
    void* p = vp_create();
    vp_feed(p, data.data(), (int64_t)data.size());
    vp_signal_end(p);
    if (!vp_has_header(p)) { vp_destroy(p); return 0; }
    int mb = ((vp_width(p) + 15) >> 4) * ((vp_height(p) + 15) >> 4);
    std::vector<int32_t> coeffs((size_t)mb * 6 * 64), nb(mb * 6),
        in(mb * 6), sel(mb), mvh(mb), mvv(mb);
    int pics = 0;
    for (;;) {
        std::memset(coeffs.data(), 0, coeffs.size() * 4);
        std::memset(nb.data(), 0, nb.size() * 4);
        std::memset(in.data(), 0, in.size() * 4);
        std::memset(sel.data(), 0, sel.size() * 4);
        std::memset(mvh.data(), 0, mvh.size() * 4);
        std::memset(mvv.data(), 0, mvv.size() * 4);
        if (vp_parse_picture(p, coeffs.data(), nb.data(), in.data(),
                             sel.data(), mvh.data(), mvv.data()) == 0)
            break;
        pics++;
    }
    vp_destroy(p);
    return pics;
}

static int run_host(const std::vector<uint8_t>& data) {
    void* p = vp_create();
    vp_feed(p, data.data(), (int64_t)data.size());
    vp_signal_end(p);
    int frames = 0;
    if (vp_has_header(p)) {
        std::vector<uint8_t> out(vp_total_size(p));
        while (vp_host_decode(p, out.data())) frames++;
    }
    vp_destroy(p);
    return frames;
}

static int run_demux(const std::vector<uint8_t>& data) {
    void* p = dx_create();
    dx_feed(p, data.data(), (int64_t)data.size());
    dx_signal_end(p);
    int packets = 0;
    if (dx_has_headers(p)) {
        int32_t typ;
        double pts;
        int64_t len;
        while (dx_decode(p, &typ, &pts, &len)) {
            volatile uint8_t sink = 0;
            const uint8_t* d = dx_payload(p);
            for (int64_t i = 0; i < len; i++) sink ^= d[i];
            (void)sink;
            packets++;
        }
    }
    dx_destroy(p);
    return packets;
}

static int run_pipeline(const std::vector<uint8_t>& data) {
    void* p = pp_create();
    pp_feed(p, data.data(), (int64_t)data.size());
    pp_signal_end(p);
    int items = 0;
    if (pp_has_headers(p)) {
        int mb = ((pp_width(p) + 15) >> 4) * ((pp_height(p) + 15) >> 4);
        if (mb > 0) {
            std::vector<int16_t> mvh(mb), mvv(mb);
            std::vector<uint16_t> nbcls(mb);
            std::vector<uint8_t> misc(mb);
            int64_t hb = ((int64_t)mb * 6 * 64 >> 16) + 2;
            while (pp_video_blob_prepare(p) != 0) {
                int64_t counts[2];
                pp_video_blob_counts(p, counts);
                std::vector<uint16_t> mi(2 * (counts[0] + hb));
                std::vector<uint16_t> ei(counts[1] + hb);
                std::vector<int32_t> ev(counts[1] + hb);
                int64_t io[4] = {0, 0, 0, 0};
                pp_video_blob_emit(p, mi.data(), ei.data(),
                                   ev.data(), mvh.data(), mvv.data(),
                                   nbcls.data(), misc.data(), 0, io);
                items++;
            }
        }
        std::vector<int32_t> out(36 * 2 * 32);
        while (pp_audio_parse_frame(p, out.data())) items++;
    }
    pp_destroy(p);
    return items;
}

static int run_audio(const std::vector<uint8_t>& data) {
    void* p = ap_create();
    ap_feed(p, data.data(), (int64_t)data.size());
    ap_signal_end(p);
    int frames = 0;
    if (ap_has_header(p)) {
        std::vector<int32_t> out(36 * 2 * 32);
        while (ap_parse_frame(p, out.data())) frames++;
    }
    ap_destroy(p);
    return frames;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s <stream file> [blob|dense|host|audio|all]\n",
                argv[0]);
        return 2;
    }
    auto data = read_file(argv[1]);
    std::string mode = argc > 2 ? argv[2] : "blob";
    if (mode == "blob" || mode == "all")
        printf("blob: %d pictures\n", run_blob(data));
    if (mode == "window" || mode == "all")
        printf("window: %d pictures\n", run_window(data));
    if (mode == "dense" || mode == "all")
        printf("dense: %d pictures\n", run_dense(data));
    if (mode == "host" || mode == "all")
        printf("host: %d frames\n", run_host(data));
    if (mode == "audio" || mode == "all")
        printf("audio: %d frames\n", run_audio(data));
    if (mode == "demux" || mode == "all")
        printf("demux: %d packets\n", run_demux(data));
    if (mode == "pipeline" || mode == "all")
        printf("pipeline: %d items\n", run_pipeline(data));
    return 0;
}
