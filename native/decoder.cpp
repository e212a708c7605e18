// srnative — native data-loader core for tpu_superresolution_tpu.
//
// Multi-threaded PNG decode straight into a caller-provided float32
// [N, H, W, C] batch buffer, replacing the reference's per-sample PIL
// decode in torch DataLoader worker processes (sr_datasets.py:63-74 +
// PairToTensor01, sr_transforms.py:125-133) with a zero-copy, thread-
// pooled native path.  Pixel semantics match data/decode.py: 8-bit
// /255, 16-bit /65535, RGB->gray via ITU-R 601 luma, alpha dropped,
// gray->RGB replication when out_channels==3.
//
// C ABI only (consumed via ctypes; no pybind11 in this image).

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr float kLumaR = 0.2989f;
constexpr float kLumaG = 0.587f;
constexpr float kLumaB = 0.114f;

struct Image {
  std::vector<uint8_t> data;  // row-major, bytes (8-bit) or BE uint16 pairs
  int h = 0, w = 0, channels = 0, bit_depth = 0;
};

// Decode one PNG file; returns false on any error.
bool decode_png(const char* path, Image* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  // Normalize: palette->RGB, <8bit gray->8bit, drop alpha.
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->h = static_cast<int>(png_get_image_height(png, info));
  out->w = static_cast<int>(png_get_image_width(png, info));
  out->channels = png_get_channels(png, info);
  out->bit_depth = png_get_bit_depth(png, info);

  size_t rowbytes = png_get_rowbytes(png, info);
  out->data.resize(rowbytes * out->h);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y) rows[y] = out->data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

// Convert a decoded image to float32 [out_h, out_w, out_c] at `dst`.
// Returns false if the decoded size doesn't match.
bool to_float(const Image& im, int out_h, int out_w, int gray, int out_c,
              float* dst) {
  if (im.h != out_h || im.w != out_w) return false;
  const int in_c = im.channels;
  const int n = im.h * im.w;
  const bool is16 = im.bit_depth == 16;
  const float inv = is16 ? 1.0f / 65535.0f : 1.0f / 255.0f;

  for (int i = 0; i < n; ++i) {
    float px[3] = {0.f, 0.f, 0.f};
    for (int c = 0; c < in_c && c < 3; ++c) {
      if (is16) {
        // PNG 16-bit samples are big-endian.
        const uint8_t* p = im.data.data() + (i * in_c + c) * 2;
        px[c] = static_cast<float>((p[0] << 8) | p[1]) * inv;
      } else {
        px[c] = static_cast<float>(im.data[i * in_c + c]) * inv;
      }
    }
    float g = px[0];
    if (in_c >= 3) {
      if (gray || out_c == 1) g = kLumaR * px[0] + kLumaG * px[1] + kLumaB * px[2];
    }
    float* o = dst + i * out_c;
    if (out_c == 1) {
      o[0] = (in_c >= 3) ? g : px[0];
    } else {  // out_c == 3
      if (in_c >= 3 && !gray) {
        o[0] = px[0]; o[1] = px[1]; o[2] = px[2];
      } else {
        const float v = (in_c >= 3) ? g : px[0];
        o[0] = v; o[1] = v; o[2] = v;
      }
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Probe image dimensions without full decode of pixel data.
int srn_probe(const char* path, int* h, int* w, int* channels, int* bit_depth) {
  Image im;  // simple: full decode (PNG has no cheap header-only API via
             // libpng high-level calls worth the complexity here)
  if (!decode_png(path, &im)) return 1;
  *h = im.h; *w = im.w; *channels = im.channels; *bit_depth = im.bit_depth;
  return 0;
}

// Decode `n` PNGs in parallel into out[n, out_h, out_w, out_c] float32.
// Returns 0 on success, or (index+1) of the first failing file.
int srn_decode_batch(const char** paths, int n, int out_h, int out_w,
                     int gray, int out_c, float* out, int num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  if (num_threads > n) num_threads = n;

  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  const size_t stride = static_cast<size_t>(out_h) * out_w * out_c;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) return;
      Image im;
      if (!decode_png(paths[i], &im) ||
          !to_float(im, out_h, out_w, gray, out_c, out + stride * i)) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        return;
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

}  // extern "C"
