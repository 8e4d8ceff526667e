// Native image loading: JPEG/PNG decode + bilinear resize to float32 RGB.
//
// The training data path decodes N camera frames per scene; CPython-side
// decoding (PIL) holds the GIL per image and becomes the input bottleneck
// once the accelerator step is fast. This C function is called from the
// SceneLoader's thread pool through ctypes (which releases the GIL), giving
// true multi-core decode. JPEG decode uses libjpeg's DCT scaling to get
// close to the target size cheaply before the bilinear pass.
//
// Output: out[h*W*3 ...] row-major HWC RGB in [0, 1].

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(FILE* f, std::vector<uint8_t>& rgb, int& w, int& h,
                 int target_w, int target_h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // DCT scaling: pick the smallest 1/1..1/8 scale still >= target
  if (target_w > 0 && target_h > 0) {
    for (int denom = 8; denom >= 1; --denom) {
      if ((int)cinfo.image_width * 1 / denom >= target_w &&
          (int)cinfo.image_height * 1 / denom >= target_h) {
        cinfo.scale_num = 1;
        cinfo.scale_denom = denom;
        break;
      }
    }
  }
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  rgb.resize((size_t)w * h * 3);
  while ((int)cinfo.output_scanline < h) {
    uint8_t* row = rgb.data() + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, std::vector<uint8_t>& rgb, int& w, int& h) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  w = png_get_image_width(png, info);
  h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  rgb.resize((size_t)w * h * 3);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = rgb.data() + (size_t)y * w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// Antialiased triangle-filter resize (the PIL BILINEAR convention: filter
// support widens with the downscale ratio), separable two-pass, float
// accumulation, normalized to [0,1].
struct FilterTaps {
  std::vector<int> start;     // first source index per output coord
  std::vector<int> count;     // taps per output coord
  std::vector<float> weight;  // flattened, max_count per coord
  int max_count = 0;
};

FilterTaps make_taps(int src, int dst) {
  FilterTaps t;
  double scale = (double)src / dst;
  double fscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * fscale;
  t.max_count = (int)ceil(support) * 2 + 1;
  t.start.resize(dst);
  t.count.resize(dst);
  t.weight.assign((size_t)dst * t.max_count, 0.0f);
  for (int x = 0; x < dst; ++x) {
    double center = (x + 0.5) * scale;
    int lo = (int)(center - support + 0.5);
    int hi = (int)(center + support + 0.5);
    if (lo < 0) lo = 0;
    if (hi > src) hi = src;
    double total = 0.0;
    for (int s = lo; s < hi; ++s) {
      double d = fabs((s + 0.5 - center) / fscale);
      double w = d < 1.0 ? 1.0 - d : 0.0;
      t.weight[(size_t)x * t.max_count + (s - lo)] = (float)w;
      total += w;
    }
    if (total > 0) {
      for (int k = 0; k < hi - lo; ++k)
        t.weight[(size_t)x * t.max_count + k] /= (float)total;
    }
    t.start[x] = lo;
    t.count[x] = hi - lo;
  }
  return t;
}

void resize_to_float(const uint8_t* src, int sw, int sh, float* dst, int dw,
                     int dh) {
  FilterTaps tx = make_taps(sw, dw);
  FilterTaps ty = make_taps(sh, dh);
  // pass 1: horizontal, uint8 -> float (sh x dw x 3)
  std::vector<float> tmp((size_t)sh * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + (size_t)y * sw * 3;
    float* out = tmp.data() + (size_t)y * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float* w = &tx.weight[(size_t)x * tx.max_count];
      int s0 = tx.start[x], n = tx.count[x];
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < n; ++k) {
        const uint8_t* p = row + (size_t)(s0 + k) * 3;
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      out[x * 3 + 0] = acc[0];
      out[x * 3 + 1] = acc[1];
      out[x * 3 + 2] = acc[2];
    }
  }
  // pass 2: vertical, float -> float [0,1] (dh x dw x 3)
  const float s255 = 1.0f / 255.0f;
  for (int y = 0; y < dh; ++y) {
    const float* w = &ty.weight[(size_t)y * ty.max_count];
    int s0 = ty.start[y], n = ty.count[y];
    float* out = dst + (size_t)y * dw * 3;
    memset(out, 0, (size_t)dw * 3 * sizeof(float));
    for (int k = 0; k < n; ++k) {
      const float* row = tmp.data() + (size_t)(s0 + k) * dw * 3;
      float wk = w[k];
      for (int i = 0; i < dw * 3; ++i) out[i] += wk * row[i];
    }
    for (int i = 0; i < dw * 3; ++i) out[i] *= s255;
  }
}

// Shared decode front-end: JPEG or PNG by magic bytes, native-size RGB8.
int decode_file(const char* path, std::vector<uint8_t>& rgb, int& w, int& h,
                int target_w, int target_h) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  uint8_t magic[8] = {0};
  if (fread(magic, 1, 8, f) != 8) {
    fclose(f);
    return 2;
  }
  rewind(f);
  bool ok;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, rgb, w, h, target_w, target_h);
  } else if (magic[0] == 0x89 && magic[1] == 'P') {
    ok = decode_png(f, rgb, w, h);
  } else {
    fclose(f);
    return 3;
  }
  fclose(f);
  if (!ok || w <= 0 || h <= 0) return 4;
  return 0;
}

}  // namespace

extern "C" {

// Decode `path` (JPEG or PNG by magic bytes) and bilinearly resize into
// out[out_h * out_w * 3] float32 RGB in [0,1]. Returns 0 on success.
int load_image_resized(const char* path, int out_h, int out_w, float* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  int rc = decode_file(path, rgb, w, h, out_w, out_h);
  if (rc) return rc;
  if (w == out_w && h == out_h) {
    const float s = 1.0f / 255.0f;
    for (size_t i = 0; i < (size_t)w * h * 3; ++i) out[i] = rgb[i] * s;
  } else {
    resize_to_float(rgb.data(), w, h, out, out_w, out_h);
  }
  return 0;
}

// Same, but quantized uint8 RGB output (round-to-nearest of the float
// pipeline's 255*v). The reference's own pipeline is uint8 after resize
// (PIL resize -> torchvision ToTensor); a uint8 batch also moves 4x fewer
// bytes host->device, with the [0,1] normalization done on-device.
int load_image_resized_u8(const char* path, int out_h, int out_w,
                          uint8_t* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  int rc = decode_file(path, rgb, w, h, out_w, out_h);
  if (rc) return rc;
  const size_t n = (size_t)out_h * out_w * 3;
  if (w == out_w && h == out_h) {
    memcpy(out, rgb.data(), n);
    return 0;
  }
  std::vector<float> tmp(n);
  resize_to_float(rgb.data(), w, h, tmp.data(), out_w, out_h);
  for (size_t i = 0; i < n; ++i) {
    float v = tmp[i] * 255.0f + 0.5f;
    out[i] = v <= 0.0f ? 0 : (v >= 255.0f ? 255 : (uint8_t)v);
  }
  return 0;
}

}  // extern "C"
