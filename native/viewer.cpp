// Native frame viewer for raycastworlds_tpu.
//
// The reference's only native dependency is the minifb C windowing library,
// used exclusively by the interactive `play!` loop
// (/root/reference/src/single_room.jl:488-568 via MiniFB.jl).  TPU hosts are
// headless, so the TPU-native equivalent is this small C++ library that
// turns device frames into things a headless host can show:
//   * PPM/raw writers for 0x00RRGGBB uint32 frames,
//   * a fast ANSI half-block compositor (2 vertical pixels per character
//     cell, 24-bit color) for live terminal rendering,
//   * frame differencing so an interactive loop redraws only changed cells.
//
// Exposed with a C ABI and loaded from Python via ctypes (no pybind11).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

namespace {

inline int clampi(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

// Append decimal integer to buffer, returns chars written.
inline int put_int(char* out, int v) {
    char tmp[12];
    int n = snprintf(tmp, sizeof tmp, "%d", v);
    memcpy(out, tmp, n);
    return n;
}

// Append "r;g;b" for a packed 0x00RRGGBB color.
inline int put_rgb(char* out, uint32_t c) {
    int n = 0;
    n += put_int(out + n, (c >> 16) & 0xFF);
    out[n++] = ';';
    n += put_int(out + n, (c >> 8) & 0xFF);
    out[n++] = ';';
    n += put_int(out + n, c & 0xFF);
    return n;
}

}  // namespace

extern "C" {

// Write a binary PPM (P6).  Returns 0 on success.
int rcw_write_ppm(const char* path, const uint32_t* img, int h, int w) {
    FILE* f = fopen(path, "wb");
    if (!f) return 1;
    fprintf(f, "P6\n%d %d\n255\n", w, h);
    std::string row(static_cast<size_t>(w) * 3, '\0');
    for (int i = 0; i < h; ++i) {
        for (int j = 0; j < w; ++j) {
            uint32_t c = img[static_cast<size_t>(i) * w + j];
            row[3 * j + 0] = static_cast<char>((c >> 16) & 0xFF);
            row[3 * j + 1] = static_cast<char>((c >> 8) & 0xFF);
            row[3 * j + 2] = static_cast<char>(c & 0xFF);
        }
        if (fwrite(row.data(), 1, row.size(), f) != row.size()) {
            fclose(f);
            return 2;
        }
    }
    fclose(f);
    return 0;
}

// Compose an ANSI 24-bit half-block frame: each output cell shows two
// vertically adjacent pixels (upper = foreground "▀", lower = background).
// Writes a NUL-terminated escape string into `out` (capacity `cap`).
// Returns bytes written (excluding NUL), or -1 if the buffer is too small.
long rcw_ansi_render(const uint32_t* img, int h, int w, char* out, long cap) {
    // Worst case per cell ~ 44 bytes; guard conservatively inside the loop.
    long n = 0;
    const char* upper_half = "\xe2\x96\x80";  // U+2580
    for (int i = 0; i + 1 < h || i < h; i += 2) {
        for (int j = 0; j < w; ++j) {
            if (n + 64 > cap) return -1;
            uint32_t top = img[static_cast<size_t>(i) * w + j];
            uint32_t bot = (i + 1 < h) ? img[static_cast<size_t>(i + 1) * w + j] : 0;
            // \e[38;2;r;g;bm \e[48;2;r;g;bm ▀
            memcpy(out + n, "\x1b[38;2;", 7); n += 7;
            n += put_rgb(out + n, top);
            out[n++] = 'm';
            memcpy(out + n, "\x1b[48;2;", 7); n += 7;
            n += put_rgb(out + n, bot);
            out[n++] = 'm';
            memcpy(out + n, upper_half, 3); n += 3;
        }
        if (n + 8 > cap) return -1;
        memcpy(out + n, "\x1b[0m\n", 5); n += 5;
    }
    if (n + 1 > cap) return -1;
    out[n] = '\0';
    return n;
}

// Count differing pixels between two frames (cheap change detection for
// interactive redraw decisions).
long rcw_frame_diff(const uint32_t* a, const uint32_t* b, long n_pixels) {
    long d = 0;
    for (long k = 0; k < n_pixels; ++k) d += (a[k] != b[k]);
    return d;
}

}  // extern "C"
