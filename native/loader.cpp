// Native data-loading runtime for invertavatar_tpu.
//
// Counterpart of the reference's host-side data path (torch DataLoader with 16
// worker processes doing PIL PNG decode + np.load per frame,
// training_loop.py:340-342). Here: a C++ thread pool decodes PNG frames and
// parses .npy tensors straight into caller-provided numpy buffers — no Python
// in the per-file inner loop, no per-batch process fork. Exposed via a plain C
// ABI for ctypes (no pybind11 in the image).
//
// Build: see invertavatar_tpu/data/native_loader.py (g++ -O3 -shared -fPIC
// loader.cpp -lpng -lz).

#include <png.h>
#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- PNG decode

int decode_png_file(const char* path, unsigned char* out, int expect_h,
                    int expect_w, int expect_c) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return -2;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    return -2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  // normalize to 8-bit RGB(A)
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (expect_c == 3) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  if ((int)h != expect_h || (int)w != expect_w || channels != expect_c) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -4;
  }
  std::vector<png_bytep> rows(h);
  size_t stride = (size_t)w * channels;
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = out + y * stride;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// ----------------------------------------------------------------- npy parse

// minimal .npy v1/v2 reader for C-contiguous <f4 / <f2 / |u1 arrays,
// converting everything to float32 in `out`.
int load_npy_f32_file(const char* path, float* out, int64_t max_elems,
                      int64_t* shape_out, int* ndim_out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  unsigned char magic[8];
  if (std::fread(magic, 1, 8, fp) != 8 || std::memcmp(magic, "\x93NUMPY", 6)) {
    std::fclose(fp);
    return -2;
  }
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char hl[2];
    if (std::fread(hl, 1, 2, fp) != 2) { std::fclose(fp); return -2; }
    header_len = hl[0] | (hl[1] << 8);
  } else {
    unsigned char hl[4];
    if (std::fread(hl, 1, 4, fp) != 4) { std::fclose(fp); return -2; }
    header_len = hl[0] | (hl[1] << 8) | (hl[2] << 16) | ((uint32_t)hl[3] << 24);
  }
  std::string header(header_len, '\0');
  if (std::fread(&header[0], 1, header_len, fp) != header_len) {
    std::fclose(fp);
    return -2;
  }

  auto find_val = [&](const char* key) -> std::string {
    size_t p = header.find(key);
    if (p == std::string::npos) return "";
    p = header.find(':', p);
    size_t q = header.find_first_of(",}", p);
    return header.substr(p + 1, q - p - 1);
  };
  std::string descr = find_val("'descr'");
  bool fortran = find_val("'fortran_order'").find("True") != std::string::npos;
  if (fortran) { std::fclose(fp); return -5; }

  size_t sp = header.find("'shape'");
  sp = header.find('(', sp);
  size_t se = header.find(')', sp);
  std::string shape_str = header.substr(sp + 1, se - sp - 1);
  int ndim = 0;
  int64_t total = 1;
  {
    const char* s = shape_str.c_str();
    char* end = nullptr;
    while (*s) {
      long long v = std::strtoll(s, &end, 10);
      if (end == s) break;
      if (ndim < 8) shape_out[ndim] = v;
      ndim++;
      total *= v;
      s = end;
      while (*s == ',' || *s == ' ') s++;
    }
  }
  *ndim_out = ndim;
  if (total > max_elems) { std::fclose(fp); return -6; }

  int kind = -1;  // 0=f4, 1=f2, 2=u1
  if (descr.find("f4") != std::string::npos) kind = 0;
  else if (descr.find("f2") != std::string::npos) kind = 1;
  else if (descr.find("u1") != std::string::npos) kind = 2;
  else { std::fclose(fp); return -7; }

  if (kind == 0) {
    if ((int64_t)std::fread(out, 4, total, fp) != total) { std::fclose(fp); return -8; }
  } else if (kind == 1) {
    std::vector<uint16_t> tmp(total);
    if ((int64_t)std::fread(tmp.data(), 2, total, fp) != total) { std::fclose(fp); return -8; }
    for (int64_t i = 0; i < total; ++i) {
      // fp16 -> fp32
      uint16_t h = tmp[i];
      uint32_t sign = (uint32_t)(h & 0x8000) << 16;
      uint32_t exp = (h >> 10) & 0x1f;
      uint32_t man = h & 0x3ff;
      uint32_t f;
      if (exp == 0) {
        if (man == 0) {
          f = sign;
        } else {  // subnormal
          exp = 127 - 15 + 1;
          while (!(man & 0x400)) { man <<= 1; exp--; }
          man &= 0x3ff;
          f = sign | (exp << 23) | (man << 13);
        }
      } else if (exp == 31) {
        f = sign | 0x7f800000 | (man << 13);
      } else {
        f = sign | ((exp - 15 + 127) << 23) | (man << 13);
      }
      std::memcpy(&out[i], &f, 4);
    }
  } else {
    std::vector<uint8_t> tmp(total);
    if ((int64_t)std::fread(tmp.data(), 1, total, fp) != total) { std::fclose(fp); return -8; }
    for (int64_t i = 0; i < total; ++i) out[i] = (float)tmp[i];
  }
  std::fclose(fp);
  return 0;
}

// ------------------------------------------------------------- parallel for

template <typename F>
int parallel_for(int n, int threads, F&& fn) {
  std::atomic<int> next(0), bad(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (fn(i) != 0) bad.fetch_add(1);
    }
  };
  int t = threads < 1 ? 1 : threads;
  std::vector<std::thread> pool;
  for (int i = 0; i < t - 1; ++i) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  return bad.load() ? -1 : 0;
}

}  // namespace

extern "C" {

int iatpu_decode_png(const char* path, unsigned char* out, int h, int w, int c) {
  return decode_png_file(path, out, h, w, c);
}

int iatpu_load_npy_f32(const char* path, float* out, int64_t max_elems,
                       int64_t* shape_out, int* ndim_out) {
  return load_npy_f32_file(path, out, max_elems, shape_out, ndim_out);
}

// Decode a batch of PNGs in parallel into out[i * h*w*c].
int iatpu_decode_png_batch(const char** paths, int n, unsigned char* out,
                           int h, int w, int c, int threads) {
  int64_t stride = (int64_t)h * w * c;
  return parallel_for(n, threads, [&](int i) {
    return decode_png_file(paths[i], out + (int64_t)i * stride, h, w, c);
  });
}

// Load a batch of .npy tensors (all the same element count) in parallel.
int iatpu_load_npy_f32_batch(const char** paths, int n, float* out,
                             int64_t elems_per_item, int threads) {
  return parallel_for(n, threads, [&](int i) {
    int64_t shape[8];
    int ndim;
    return load_npy_f32_file(paths[i], out + (int64_t)i * elems_per_item,
                             elems_per_item, shape, &ndim);
  });
}

}  // extern "C"
