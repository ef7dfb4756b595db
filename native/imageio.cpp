// Native image-IO runtime: PNG/PPM writers + unit-float → u8 quantisation.
//
// The reference has no native components at all (SURVEY.md §2.4) — its
// image path is matplotlib on CPU.  Here the host-side output path (the
// only part of the pipeline that isn't XLA) is C++: zlib-deflate PNG
// encoding and the clip/scale/round quantisation of unit-range frames,
// callable from Python via ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -shared -fPIC imageio.cpp -lz -o libimageio.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>
#include <zlib.h>

extern "C" {

// min(1, x) * 255 with round-half-even, matching the renderer's unit mode.
void quantise_unit_u8(const float* img, uint8_t* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        float v = img[i];
        if (v < 0.f) v = 0.f;
        if (v > 1.f) v = 1.f;
        float s = v * 255.f;
        float fl = static_cast<int64_t>(s);
        float frac = s - fl;
        int64_t q = static_cast<int64_t>(fl);
        if (frac > 0.5f || (frac == 0.5f && (q & 1))) q += 1;
        out[i] = static_cast<uint8_t>(q);
    }
}

int write_ppm(const char* path, const uint8_t* rgb, int w, int h) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    fprintf(f, "P6\n%d %d\n255\n", w, h);
    size_t n = static_cast<size_t>(w) * h * 3;
    size_t written = fwrite(rgb, 1, n, f);
    fclose(f);
    return written == n ? 0 : -2;
}

static void put_be32(std::vector<uint8_t>& v, uint32_t x) {
    v.push_back(x >> 24); v.push_back(x >> 16); v.push_back(x >> 8);
    v.push_back(x);
}

static void chunk(std::vector<uint8_t>& out, const char type[4],
                  const uint8_t* data, uint32_t len) {
    put_be32(out, len);
    size_t start = out.size();
    out.insert(out.end(), type, type + 4);
    if (len) out.insert(out.end(), data, data + len);
    uint32_t crc = crc32(0L, out.data() + start, len + 4);
    put_be32(out, crc);
}

// Filter-type-0 scanlines, one complete zlib stream (shared by PNG frames
// and APNG frame data — the APNG spec requires each frame's fdAT chain to
// decompress as an independent stream).
static int compress_frame(const uint8_t* rgb, int w, int h,
                          std::vector<uint8_t>& comp) {
    std::vector<uint8_t> raw;
    raw.reserve(static_cast<size_t>(h) * (1 + static_cast<size_t>(w) * 3));
    for (int y = 0; y < h; ++y) {
        raw.push_back(0);
        const uint8_t* row = rgb + static_cast<size_t>(y) * w * 3;
        raw.insert(raw.end(), row, row + static_cast<size_t>(w) * 3);
    }
    uLongf comp_cap = compressBound(raw.size());
    comp.resize(comp_cap);
    if (compress2(comp.data(), &comp_cap, raw.data(), raw.size(), 6) != Z_OK)
        return -3;
    comp.resize(comp_cap);
    return 0;
}

static void png_header(std::vector<uint8_t>& png, int w, int h) {
    static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
    png.insert(png.end(), sig, sig + 8);
    uint8_t ihdr[13];
    ihdr[0] = w >> 24; ihdr[1] = w >> 16; ihdr[2] = w >> 8; ihdr[3] = w;
    ihdr[4] = h >> 24; ihdr[5] = h >> 16; ihdr[6] = h >> 8; ihdr[7] = h;
    ihdr[8] = 8;   // bit depth
    ihdr[9] = 2;   // colour type: truecolour
    ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
    chunk(png, "IHDR", ihdr, 13);
}

static int write_all(const char* path, const std::vector<uint8_t>& png) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    size_t written = fwrite(png.data(), 1, png.size(), f);
    fclose(f);
    return written == png.size() ? 0 : -2;
}

int write_png(const char* path, const uint8_t* rgb, int w, int h) {
    std::vector<uint8_t> comp;
    int rc = compress_frame(rgb, w, h, comp);
    if (rc) return rc;
    std::vector<uint8_t> png;
    png_header(png, w, h);
    chunk(png, "IDAT", comp.data(), static_cast<uint32_t>(comp.size()));
    chunk(png, "IEND", nullptr, 0);
    return write_all(path, png);
}

// Animated PNG (APNG): acTL declares the frame count, each frame carries an
// fcTL timing chunk; frame 0's pixels ride the ordinary IDAT, later frames
// ride fdAT (sequence number + an independent zlib stream).  Full-frame
// replace semantics (dispose_op=0, blend_op=0) — exact per-frame pixels,
// no delta encoding.  delay = delay_num/delay_den seconds per frame.
int write_apng(const char* path, const uint8_t* rgb, int w, int h,
               int frames, int delay_num, int delay_den) {
    if (frames < 1) return -4;
    std::vector<uint8_t> png;
    png_header(png, w, h);
    uint8_t actl[8];
    actl[0] = frames >> 24; actl[1] = frames >> 16;
    actl[2] = frames >> 8;  actl[3] = frames;
    actl[4] = actl[5] = actl[6] = actl[7] = 0;   // num_plays 0 = loop forever
    chunk(png, "acTL", actl, 8);

    uint32_t seq = 0;
    const size_t frame_bytes = static_cast<size_t>(w) * h * 3;
    for (int fi = 0; fi < frames; ++fi) {
        uint8_t fctl[26];
        fctl[0] = seq >> 24; fctl[1] = seq >> 16; fctl[2] = seq >> 8;
        fctl[3] = seq; ++seq;
        fctl[4] = w >> 24; fctl[5] = w >> 16; fctl[6] = w >> 8; fctl[7] = w;
        fctl[8] = h >> 24; fctl[9] = h >> 16; fctl[10] = h >> 8; fctl[11] = h;
        memset(fctl + 12, 0, 8);                     // x/y offset 0
        fctl[20] = delay_num >> 8; fctl[21] = delay_num;
        fctl[22] = delay_den >> 8; fctl[23] = delay_den;
        fctl[24] = 0;                                // dispose_op: none
        fctl[25] = 0;                                // blend_op: source
        chunk(png, "fcTL", fctl, 26);

        std::vector<uint8_t> comp;
        int rc = compress_frame(rgb + frame_bytes * fi, w, h, comp);
        if (rc) return rc;
        if (fi == 0) {
            chunk(png, "IDAT", comp.data(), static_cast<uint32_t>(comp.size()));
        } else {
            std::vector<uint8_t> fdat;
            put_be32(fdat, seq); ++seq;
            fdat.insert(fdat.end(), comp.begin(), comp.end());
            chunk(png, "fdAT", fdat.data(), static_cast<uint32_t>(fdat.size()));
        }
    }
    chunk(png, "IEND", nullptr, 0);
    return write_all(path, png);
}

}  // extern "C"
