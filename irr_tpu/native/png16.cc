// Native data-loader core: PNG row defiltering for 16-bit RGB images
// (KITTI flow maps). The zlib inflate happens in Python (zlib is C already);
// this removes the per-row/per-byte Python loop from the decode hot path.
//
// Exposed via ctypes (no pybind11 in this image); see native/__init__.py.

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// raw: decompressed PNG stream, h rows of (1 filter byte + stride bytes).
// out: h * stride bytes (filtered rows reconstructed in place).
// bpp: bytes per pixel (6 for 16-bit RGB).
// Returns 0 on success, -1 on unknown filter type.
int png_defilter(const uint8_t* raw, uint8_t* out, int64_t h, int64_t stride,
                 int64_t bpp) {
    const uint8_t* prev = nullptr;
    for (int64_t y = 0; y < h; ++y) {
        const uint8_t ftype = raw[y * (stride + 1)];
        const uint8_t* line = raw + y * (stride + 1) + 1;
        uint8_t* cur = out + y * stride;
        switch (ftype) {
            case 0:  // None
                memcpy(cur, line, stride);
                break;
            case 1:  // Sub
                for (int64_t x = 0; x < stride; ++x) {
                    const uint8_t a = x >= bpp ? cur[x - bpp] : 0;
                    cur[x] = (uint8_t)(line[x] + a);
                }
                break;
            case 2:  // Up
                if (prev == nullptr) {
                    memcpy(cur, line, stride);
                } else {
                    for (int64_t x = 0; x < stride; ++x)
                        cur[x] = (uint8_t)(line[x] + prev[x]);
                }
                break;
            case 3:  // Average
                for (int64_t x = 0; x < stride; ++x) {
                    const int a = x >= bpp ? cur[x - bpp] : 0;
                    const int b = prev ? prev[x] : 0;
                    cur[x] = (uint8_t)(line[x] + ((a + b) >> 1));
                }
                break;
            case 4:  // Paeth
                for (int64_t x = 0; x < stride; ++x) {
                    const int a = x >= bpp ? cur[x - bpp] : 0;
                    const int b = prev ? prev[x] : 0;
                    const int c = (prev && x >= bpp) ? prev[x - bpp] : 0;
                    const int p = a + b - c;
                    const int pa = p > a ? p - a : a - p;
                    const int pb = p > b ? p - b : b - p;
                    const int pc = p > c ? p - c : c - p;
                    const int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                    cur[x] = (uint8_t)(line[x] + pred);
                }
                break;
            default:
                return -1;
        }
        prev = cur;
    }
    return 0;
}

// Convert defiltered big-endian 16-bit RGB bytes to uint16 host order.
void be16_to_u16(const uint8_t* in, uint16_t* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i)
        out[i] = (uint16_t)((in[2 * i] << 8) | in[2 * i + 1]);
}

}  // extern "C"
