// Native ingest pipeline for mmdyn-tpu dataset compile.
//
// Replaces the per-frame PIL work of the compile path
// (mmdyn/pytorch/utils/datasets.py:159-312 semantics) with a C++
// implementation: minimal PNG decode (zlib inflate + unfilter), PIL-semantics
// crop (round-half-even box), Pillow-style antialiased separable resampling
// (bicubic for the 256 stage — Pillow's default resample — and bilinear for
// the 64 stage), seg==1 zeroing, and per-channel-std availability flags.
// OpenMP parallel over frames.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC ingest.cpp -lz -o libmmdyn_ingest.so

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <cmath>
#include <cfenv>
#include <algorithm>
#include <vector>
#include <zlib.h>

namespace {

// ---------------------------------------------------------------------------
// PNG decode (8-bit, non-interlaced; color types 0, 2, 3, 4, 6)
// ---------------------------------------------------------------------------

struct Image {
    int w = 0, h = 0, c = 0;     // c = channels after decode (1, 3 or 4)
    std::vector<uint8_t> data;   // row-major, interleaved
};

static uint32_t be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

static int paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

static bool decode_png(const uint8_t* buf, size_t len, Image& out) {
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (len < 8 || std::memcmp(buf, sig, 8) != 0) return false;
    size_t pos = 8;
    int width = 0, height = 0, bit_depth = 0, color_type = 0, interlace = 0;
    std::vector<uint8_t> idat;
    std::vector<uint8_t> palette;    // 3 * n
    std::vector<uint8_t> trns;

    while (pos + 8 <= len) {
        uint32_t clen = be32(buf + pos);
        const uint8_t* type = buf + pos + 4;
        const uint8_t* dat = buf + pos + 8;
        if (pos + 12 + clen > len) return false;
        if (!std::memcmp(type, "IHDR", 4)) {
            width = be32(dat); height = be32(dat + 4);
            bit_depth = dat[8]; color_type = dat[9];
            interlace = dat[12];
            if (bit_depth != 8 || interlace != 0) return false;
        } else if (!std::memcmp(type, "PLTE", 4)) {
            palette.assign(dat, dat + clen);
        } else if (!std::memcmp(type, "tRNS", 4)) {
            trns.assign(dat, dat + clen);
        } else if (!std::memcmp(type, "IDAT", 4)) {
            idat.insert(idat.end(), dat, dat + clen);
        } else if (!std::memcmp(type, "IEND", 4)) {
            break;
        }
        pos += 12 + clen;
    }
    if (width <= 0 || height <= 0 || idat.empty()) return false;

    int ch;
    switch (color_type) {
        case 0: ch = 1; break;  // gray
        case 2: ch = 3; break;  // rgb
        case 3: ch = 1; break;  // palette indices
        case 4: ch = 2; break;  // gray + alpha
        case 6: ch = 4; break;  // rgba
        default: return false;
    }

    size_t stride = size_t(width) * ch;
    std::vector<uint8_t> raw((stride + 1) * height);
    uLongf raw_len = raw.size();
    if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
        return false;

    // unfilter
    std::vector<uint8_t> img(stride * height);
    int bpp = ch;
    for (int y = 0; y < height; ++y) {
        const uint8_t* src = raw.data() + size_t(y) * (stride + 1);
        uint8_t filter = src[0];
        const uint8_t* srow = src + 1;
        uint8_t* drow = img.data() + size_t(y) * stride;
        const uint8_t* prow = y ? img.data() + size_t(y - 1) * stride : nullptr;
        for (size_t x = 0; x < stride; ++x) {
            int a = x >= size_t(bpp) ? drow[x - bpp] : 0;
            int b = prow ? prow[x] : 0;
            int c = (prow && x >= size_t(bpp)) ? prow[x - bpp] : 0;
            int v = srow[x];
            switch (filter) {
                case 0: break;
                case 1: v += a; break;
                case 2: v += b; break;
                case 3: v += (a + b) / 2; break;
                case 4: v += paeth(a, b, c); break;
                default: return false;
            }
            drow[x] = uint8_t(v);
        }
    }

    // normalise channel layouts: palette stays as raw indices (PIL's
    // np.array on a P-mode image yields indices — parity with the PIL
    // compile path); gray+alpha -> gray; rgba kept
    if (color_type == 3) {
        out.w = width; out.h = height; out.c = 1;
        out.data = std::move(img);
        (void)palette;
    } else if (color_type == 4) {
        out.w = width; out.h = height; out.c = 1;
        out.data.resize(size_t(width) * height);
        for (size_t i = 0; i < size_t(width) * height; ++i)
            out.data[i] = img[i * 2];
    } else {
        out.w = width; out.h = height; out.c = ch;
        out.data = std::move(img);
    }
    return true;
}

static bool load_png_file(const char* path, Image& out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(n);
    size_t rd = std::fread(buf.data(), 1, n, f);
    std::fclose(f);
    if ((long)rd != n) return false;
    return decode_png(buf.data(), buf.size(), out);
}

// ---------------------------------------------------------------------------
// Pillow-semantics crop + resample
// ---------------------------------------------------------------------------

static int round_half_even(double v) {
    // PIL crop rounds each box coordinate with Python round()
    return int(std::nearbyint(v));  // default FE_TONEAREST = half-to-even
}

static void crop(const Image& in, double x0, double y0, double x1, double y1,
                 Image& out) {
    int ix0 = round_half_even(x0), iy0 = round_half_even(y0);
    int ix1 = round_half_even(x1), iy1 = round_half_even(y1);
    int w = std::max(0, ix1 - ix0), h = std::max(0, iy1 - iy0);
    out.w = w; out.h = h; out.c = in.c;
    out.data.assign(size_t(w) * h * in.c, 0);
    for (int y = 0; y < h; ++y) {
        int sy = iy0 + y;
        if (sy < 0 || sy >= in.h) continue;   // PIL pads out-of-range with 0
        int cx0 = std::max(ix0, 0), cx1 = std::min(ix1, in.w);
        if (cx0 >= cx1) continue;
        std::memcpy(out.data.data() + (size_t(y) * w + (cx0 - ix0)) * in.c,
                    in.data.data() + (size_t(sy) * in.w + cx0) * in.c,
                    size_t(cx1 - cx0) * in.c);
    }
}

struct Filter {
    double support;
    double (*fn)(double);
};

static double bilinear_fn(double x) {
    x = std::fabs(x);
    return x < 1.0 ? 1.0 - x : 0.0;
}

static double bicubic_fn(double x) {
    // Keys cubic, a = -0.5 (Pillow's BICUBIC)
    const double a = -0.5;
    x = std::fabs(x);
    if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
    if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
    return 0.0;
}

// one separable pass along x; transposes output so two passes resize both axes
static void resample_pass(const std::vector<float>& in, int in_w, int in_h,
                          int c, int out_w, const Filter& flt,
                          std::vector<float>& out) {
    double scale = double(in_w) / out_w;
    double filterscale = std::max(scale, 1.0);
    double support = flt.support * filterscale;
    out.assign(size_t(out_w) * in_h * c, 0.f);

    std::vector<double> weights;
    for (int xx = 0; xx < out_w; ++xx) {
        double center = (xx + 0.5) * scale;
        int xmin = std::max(0, int(std::floor(center - support)));
        int xmax = std::min(in_w, int(std::ceil(center + support)));
        weights.resize(xmax - xmin);
        double wsum = 0;
        for (int x = xmin; x < xmax; ++x) {
            double w = flt.fn((x + 0.5 - center) / filterscale);
            weights[x - xmin] = w;
            wsum += w;
        }
        if (wsum != 0)
            for (auto& w : weights) w /= wsum;
        for (int y = 0; y < in_h; ++y) {
            const float* row = in.data() + (size_t(y) * in_w) * c;
            for (int ch = 0; ch < c; ++ch) {
                double acc = 0;
                for (int x = xmin; x < xmax; ++x)
                    acc += weights[x - xmin] * row[size_t(x) * c + ch];
                // transposed write: (x_out, y) -> row y_out=x_out
                out[(size_t(xx) * in_h + y) * c + ch] = float(acc);
            }
        }
    }
}

static void resize(const Image& in, int out_w, int out_h, const Filter& flt,
                   Image& out) {
    std::vector<float> f(in.data.begin(), in.data.end());
    std::vector<float> tmp, tmp2;
    resample_pass(f, in.w, in.h, in.c, out_w, flt, tmp);       // -> (out_w rows of in.h)
    resample_pass(tmp, in.h, out_w, in.c, out_h, flt, tmp2);   // -> (out_h rows of out_w)
    out.w = out_w; out.h = out_h; out.c = in.c;
    out.data.resize(size_t(out_w) * out_h * in.c);
    for (size_t i = 0; i < out.data.size(); ++i) {
        float v = tmp2[i];
        out.data[i] = uint8_t(std::min(255.f, std::max(0.f, std::round(v))));
    }
}

// ---------------------------------------------------------------------------
// compile-path primitives (datasets.py parity)
// ---------------------------------------------------------------------------

static void bounding_box(const Image& seg, double* box) {
    // np.where(img == max) square-expanded bbox (datasets.py:347-366);
    // on multi-channel images numpy scans all channels — max over everything,
    // pixel coordinates from the first two axes.
    int maxv = 0;
    for (uint8_t v : seg.data) maxv = std::max(maxv, int(v));
    int ymin = seg.h, ymax = -1, xmin = seg.w, xmax = -1;
    for (int y = 0; y < seg.h; ++y)
        for (int x = 0; x < seg.w; ++x)
            for (int ch = 0; ch < seg.c; ++ch)
                if (seg.data[(size_t(y) * seg.w + x) * seg.c + ch] == maxv) {
                    ymin = std::min(ymin, y); ymax = std::max(ymax, y);
                    xmin = std::min(xmin, x); xmax = std::max(xmax, x);
                }
    double dymin = ymin, dymax = ymax, dxmin = xmin, dxmax = xmax;
    double height = dymax - dymin, width = dxmax - dxmin;
    double diff = height - width;
    if (diff > 0) {
        dxmin = std::max(0.0, dxmin - diff / 2);
        dxmax = std::min(double(seg.w), dxmax + diff / 2);
    } else if (diff < 0) {
        dymin = std::max(0.0, ymin - std::fabs(diff) / 2);
        dymax = std::min(double(seg.h), ymax + std::fabs(diff) / 2);
    }
    box[0] = dxmin; box[1] = dymin; box[2] = dxmax; box[3] = dymax;
}

static void expand3(Image& img) {
    if (img.c == 3) return;
    Image out;
    out.w = img.w; out.h = img.h; out.c = 3;
    out.data.resize(size_t(img.w) * img.h * 3);
    if (img.c == 1) {
        for (size_t i = 0; i < size_t(img.w) * img.h; ++i)
            out.data[i * 3] = out.data[i * 3 + 1] = out.data[i * 3 + 2] = img.data[i];
    } else {  // 4 -> drop alpha
        for (size_t i = 0; i < size_t(img.w) * img.h; ++i)
            for (int ch = 0; ch < 3; ++ch)
                out.data[i * 3 + ch] = img.data[i * img.c + ch];
    }
    img = std::move(out);
}

// load + crop + bicubic-256 (the _load_image path, datasets.py:318-345)
static bool load_256(const char* path, const double* box, Image& out) {
    Image img;
    if (!load_png_file(path, img)) return false;
    Image cropped;
    if (box) {
        crop(img, box[0], box[1], box[2], box[3], cropped);
    } else {
        cropped = std::move(img);
    }
    Image r;
    resize(cropped, 256, 256, Filter{2.0, bicubic_fn}, r);
    expand3(r);
    out = std::move(r);
    return true;
}

static void std_any(const Image& img, float* flag) {
    // available_modals entry: float(std(img, axis=(0,1)).any())
    // per-channel std > 0 <=> channel not constant
    for (int ch = 0; ch < img.c && ch < 3; ++ch) {
        uint8_t first = img.data[ch];
        for (size_t i = 0; i < size_t(img.w) * img.h; ++i) {
            if (img.data[i * img.c + ch] != first) { *flag = 1.f; return; }
        }
    }
    *flag = 0.f;
}

static void to64(const Image& img256, uint8_t* out) {
    Image r;
    resize(img256, 64, 64, Filter{1.0, bilinear_fn}, r);
    std::memcpy(out, r.data.data(), 64 * 64 * 3);
}

}  // namespace

extern "C" {

// Decode a PNG file into `out` (capacity `cap` bytes). Returns the channel
// count, 0 on decode failure, or -1 if the decoded image exceeds `cap`.
int mmdyn_decode_png(const char* path, uint8_t* out, long long cap,
                     int* w, int* h) {
    Image img;
    if (!load_png_file(path, img)) return 0;
    if ((long long)img.data.size() > cap) return -1;
    *w = img.w; *h = img.h;
    std::memcpy(out, img.data.data(), img.data.size());
    return img.c;
}

// Per-frame compile: seg bbox -> crop -> 256 bicubic -> seg==1 zero ->
// avail flags -> 64 bilinear. Outputs are 64*64*3 uint8 each, avail is 2
// floats. `use_crop == 0` skips the bbox re-crop (the --no-crop compile
// variant that keeps world xy observable). Returns 0 on success.
int mmdyn_compile_frame(const char* seg_path, const char* vis_path,
                        const char* tac_path, uint8_t* out_vis,
                        uint8_t* out_tac, uint8_t* out_seg, float* out_avail,
                        int use_crop) {
    double box_storage[4];
    const double* box = nullptr;
    if (use_crop) {
        Image seg_raw;
        if (!load_png_file(seg_path, seg_raw)) return 1;
        bounding_box(seg_raw, box_storage);
        box = box_storage;
    }

    Image seg256, vis256, tac256;
    if (!load_256(seg_path, box, seg256)) return 2;
    if (!load_256(vis_path, box, vis256)) return 3;
    if (!load_256(tac_path, box, tac256)) return 4;

    // np.where(seg == 1, 0, seg) (datasets.py:240)
    for (auto& v : seg256.data)
        if (v == 1) v = 0;

    std_any(vis256, &out_avail[0]);
    std_any(tac256, &out_avail[1]);

    to64(vis256, out_vis);
    to64(tac256, out_tac);
    to64(seg256, out_seg);
    return 0;
}

// Final-frame targets: bbox from the final seg, visual+tactile crops.
int mmdyn_compile_final(const char* seg_path, const char* vis_path,
                        const char* tac_path, uint8_t* out_vis,
                        uint8_t* out_tac, int use_crop) {
    double box_storage[4];
    const double* box = nullptr;
    if (use_crop) {
        Image seg_raw;
        if (!load_png_file(seg_path, seg_raw)) return 1;
        bounding_box(seg_raw, box_storage);
        box = box_storage;
    }
    Image vis256, tac256;
    if (!load_256(vis_path, box, vis256)) return 2;
    if (!load_256(tac_path, box, tac256)) return 3;
    to64(vis256, out_vis);
    to64(tac256, out_tac);
    return 0;
}

// Batch compile with OpenMP over frames. Paths are arrays of C strings.
// Outputs are contiguous (n, 64, 64, 3) / (n, 2). Returns #failures.
int mmdyn_compile_frames(int n, const char** seg_paths, const char** vis_paths,
                         const char** tac_paths, uint8_t* out_vis,
                         uint8_t* out_tac, uint8_t* out_seg, float* out_avail,
                         int use_crop) {
    int failures = 0;
#pragma omp parallel for schedule(dynamic) reduction(+:failures)
    for (int i = 0; i < n; ++i) {
        int rc = mmdyn_compile_frame(
            seg_paths[i], vis_paths[i], tac_paths[i],
            out_vis + size_t(i) * 64 * 64 * 3,
            out_tac + size_t(i) * 64 * 64 * 3,
            out_seg + size_t(i) * 64 * 64 * 3,
            out_avail + size_t(i) * 2, use_crop);
        if (rc != 0) failures += 1;
    }
    return failures;
}

}  // extern "C"
