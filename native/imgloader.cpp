// Native host-side image loader: multithreaded JPEG/PNG decode + resize.
//
// Role: the reference's input pipeline leans on native code inside Pillow /
// OpenCV / rasterio (SURVEY.md §2.10); this is the framework's own native
// equivalent for the host-side hot path — decoding and resizing image files
// into pinned float32/uint8 batches that feed the on-device augmentation
// kernels. Exposed to Python via ctypes (see
// dinomc_tpu/data/native_loader.py); falls back to PIL when unbuilt.
//
// Build: make -C native   (links against system libjpeg + libpng)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <tiffio.h>
#include <csetjmp>
#include <cmath>
#include <algorithm>

namespace {

struct Image {
  std::vector<uint8_t> data;  // RGB8, row-major
  int h = 0, w = 0;
};

// ---------------------------------------------------------------- JPEG ----

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
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
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------- PNG ----

bool decode_png(FILE* f, Image* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
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
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // normalize anything to 8-bit RGB
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA ||
      png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->w = int(w);
  out->h = int(h);
  out->data.resize(size_t(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// ---------------------------------------------------------------- TIFF ----

// SeCo-100K ships RGB GeoTIFFs (SURVEY.md §2.2, dino_dataset.py:16-30); the
// reference decodes them with PIL/rasterio. libtiff's RGBA path handles
// striped/tiled layouts and all baseline compressions; geo tags are ignored.
// Multispectral >8-bit stacks stay on the Python rasterio-gated path.
bool decode_tiff(const char* path, Image* out) {
  TIFFSetWarningHandler(nullptr);  // geo tags trigger benign tag warnings
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return false;
  uint32_t w = 0, h = 0;
  TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w);
  TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &h);
  if (w == 0 || h == 0) {
    TIFFClose(tif);
    return false;
  }
  std::vector<uint32_t> raster(size_t(w) * h);
  // Top-left orientation delivers rows in the same order as JPEG/PNG.
  if (!TIFFReadRGBAImageOriented(tif, w, h, raster.data(),
                                 ORIENTATION_TOPLEFT, 0)) {
    TIFFClose(tif);
    return false;
  }
  TIFFClose(tif);
  out->w = int(w);
  out->h = int(h);
  out->data.resize(size_t(w) * h * 3);
  const uint32_t* src = raster.data();
  uint8_t* dst = out->data.data();
  for (size_t i = 0, n = size_t(w) * h; i < n; ++i) {
    const uint32_t px = src[i];
    dst[3 * i + 0] = TIFFGetR(px);
    dst[3 * i + 1] = TIFFGetG(px);
    dst[3 * i + 2] = TIFFGetB(px);
  }
  return true;
}

// Raw single-band read (multispectral path): Sentinel-2 band files are
// uint16 single-sample GeoTIFFs; the reference reads them with rasterio
// (dino_dataset.py:73-87). Returns raw DN values as float32, no scaling.
// Handles striped + tiled layouts, 8/16/32-bit unsigned/float samples,
// contiguous or separate planar config. band is 1-indexed.
bool read_band_f32(const char* path, int band, std::vector<float>* out,
                   int* w_out, int* h_out) {
  TIFFSetWarningHandler(nullptr);
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return false;
  uint32_t w = 0, h = 0;
  uint16_t spp = 1, bps = 8, fmt = SAMPLEFORMAT_UINT, planar = PLANARCONFIG_CONTIG;
  TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w);
  TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &h);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLESPERPIXEL, &spp);
  TIFFGetFieldDefaulted(tif, TIFFTAG_BITSPERSAMPLE, &bps);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLEFORMAT, &fmt);
  TIFFGetFieldDefaulted(tif, TIFFTAG_PLANARCONFIG, &planar);
  if (w == 0 || h == 0 || band < 1 || band > spp ||
      (bps != 8 && bps != 16 && bps != 32) ||
      (fmt != SAMPLEFORMAT_UINT && fmt != SAMPLEFORMAT_INT &&
       fmt != SAMPLEFORMAT_IEEEFP)) {
    TIFFClose(tif);
    return false;
  }
  out->assign(size_t(w) * h, 0.f);
  const int b = band - 1;
  const size_t bytes_per = bps / 8;

  auto to_f32 = [&](const uint8_t* src, size_t n_px, size_t stride_samples,
                    float* dst) {
    // src points at the first sample of the wanted band; stride in samples
    for (size_t i = 0; i < n_px; ++i) {
      const uint8_t* p = src + i * stride_samples * bytes_per;
      float v;
      if (bps == 8) {
        v = fmt == SAMPLEFORMAT_INT ? float(*reinterpret_cast<const int8_t*>(p))
                                    : float(*p);
      } else if (bps == 16) {
        v = fmt == SAMPLEFORMAT_INT
                ? float(*reinterpret_cast<const int16_t*>(p))
                : float(*reinterpret_cast<const uint16_t*>(p));
      } else {
        v = fmt == SAMPLEFORMAT_IEEEFP
                ? *reinterpret_cast<const float*>(p)
                : (fmt == SAMPLEFORMAT_INT
                       ? float(*reinterpret_cast<const int32_t*>(p))
                       : float(*reinterpret_cast<const uint32_t*>(p)));
      }
      dst[i] = v;
    }
  };

  const size_t samp_stride = planar == PLANARCONFIG_CONTIG ? spp : 1;
  bool ok = true;
  if (TIFFIsTiled(tif)) {
    uint32_t tw = 0, th = 0;
    TIFFGetField(tif, TIFFTAG_TILEWIDTH, &tw);
    TIFFGetField(tif, TIFFTAG_TILELENGTH, &th);
    std::vector<uint8_t> tile(TIFFTileSize(tif));
    for (uint32_t y0 = 0; y0 < h && ok; y0 += th) {
      for (uint32_t x0 = 0; x0 < w && ok; x0 += tw) {
        const uint16_t plane = planar == PLANARCONFIG_CONTIG ? 0 : b;
        if (TIFFReadTile(tif, tile.data(), x0, y0, 0, plane) < 0) {
          ok = false;
          break;
        }
        const size_t off0 = planar == PLANARCONFIG_CONTIG ? size_t(b) : 0;
        for (uint32_t ty = 0; ty < th && y0 + ty < h; ++ty) {
          const uint32_t n_px = std::min(tw, w - x0);
          to_f32(tile.data() + (size_t(ty) * tw * samp_stride + off0) * bytes_per,
                 n_px, samp_stride, out->data() + size_t(y0 + ty) * w + x0);
        }
      }
    }
  } else {
    std::vector<uint8_t> row(TIFFScanlineSize(tif));
    const uint16_t plane = planar == PLANARCONFIG_CONTIG ? 0 : b;
    const size_t off0 = planar == PLANARCONFIG_CONTIG ? size_t(b) : 0;
    for (uint32_t y = 0; y < h; ++y) {
      if (TIFFReadScanline(tif, row.data(), y, plane) < 0) {
        ok = false;
        break;
      }
      to_f32(row.data() + off0 * bytes_per, w, samp_stride,
             out->data() + size_t(y) * w);
    }
  }
  TIFFClose(tif);
  if (ok) {
    *w_out = int(w);
    *h_out = int(h);
  }
  return ok;
}

// -------------------------------------------------------------- decode ----

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  bool is_tiff =
      got >= 4 && ((magic[0] == 'I' && magic[1] == 'I' && magic[2] == 42) ||
                   (magic[0] == 'M' && magic[1] == 'M' && magic[3] == 42));
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, out);
  }
  fclose(f);
  if (is_tiff) ok = decode_tiff(path, out);
  return ok;
}

// -------------------------------------------------------------- resize ----

// PIL-convention separable triangle (bilinear) resize with antialiasing on
// downscale: the filter support scales with the reduction factor, matching
// Pillow's Image.BILINEAR resampling.
struct FilterTable {
  std::vector<float> weights;  // per output index: ksize weights
  std::vector<int> starts;     // first source index per output index
  int ksize = 0;
};

FilterTable build_triangle_table(int in_size, int out_size) {
  FilterTable t;
  const double scale = double(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // triangle filter support = 1
  t.ksize = int(std::ceil(support)) * 2 + 1;
  t.weights.assign(size_t(out_size) * t.ksize, 0.f);
  t.starts.assign(out_size, 0);
  for (int i = 0; i < out_size; ++i) {
    const double center = (i + 0.5) * scale;
    int lo = int(center - support + 0.5);
    if (lo < 0) lo = 0;
    int hi = int(center + support + 0.5);
    if (hi > in_size) hi = in_size;
    t.starts[i] = lo;
    double sum = 0.0;
    for (int j = lo; j < hi; ++j) {
      double x = (j + 0.5 - center) / filterscale;
      double wgt = x < 0 ? 1.0 + x : 1.0 - x;  // triangle
      if (wgt < 0) wgt = 0;
      t.weights[size_t(i) * t.ksize + (j - lo)] = float(wgt);
      sum += wgt;
    }
    if (sum > 0) {
      for (int k = 0; k < t.ksize; ++k)
        t.weights[size_t(i) * t.ksize + k] /= float(sum);
    }
  }
  return t;
}

void resize_bilinear(const Image& src, uint8_t* dst, int oh, int ow) {
  FilterTable tx = build_triangle_table(src.w, ow);
  FilterTable ty = build_triangle_table(src.h, oh);
  // horizontal pass: (h, w, 3) -> (h, ow, 3) in float
  std::vector<float> tmp(size_t(src.h) * ow * 3);
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* row = &src.data[size_t(y) * src.w * 3];
    for (int x = 0; x < ow; ++x) {
      const float* wts = &tx.weights[size_t(x) * tx.ksize];
      const int lo = tx.starts[x];
      float acc[3] = {0, 0, 0};
      const int kmax = std::min(tx.ksize, src.w - lo);
      for (int k = 0; k < kmax; ++k) {
        const float wgt = wts[k];
        if (wgt == 0.f) continue;
        const uint8_t* p = row + size_t(lo + k) * 3;
        acc[0] += wgt * p[0];
        acc[1] += wgt * p[1];
        acc[2] += wgt * p[2];
      }
      float* o = &tmp[(size_t(y) * ow + x) * 3];
      o[0] = acc[0]; o[1] = acc[1]; o[2] = acc[2];
    }
  }
  // vertical pass: (h, ow, 3) -> (oh, ow, 3)
  for (int y = 0; y < oh; ++y) {
    const float* wts = &ty.weights[size_t(y) * ty.ksize];
    const int lo = ty.starts[y];
    const int kmax = std::min(ty.ksize, src.h - lo);
    for (int x = 0; x < ow; ++x) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < kmax; ++k) {
        const float wgt = wts[k];
        if (wgt == 0.f) continue;
        const float* p = &tmp[(size_t(lo + k) * ow + x) * 3];
        acc[0] += wgt * p[0];
        acc[1] += wgt * p[1];
        acc[2] += wgt * p[2];
      }
      uint8_t* o = dst + (size_t(y) * ow + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = acc[c] + 0.5f;
        o[c] = v <= 0 ? 0 : (v >= 255.f ? 255 : uint8_t(v));
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode one image into an RGB8 buffer of (out_h, out_w). Returns 0 on
// success, nonzero on failure. out must hold out_h*out_w*3 bytes.
int imgloader_decode(const char* path, uint8_t* out, int out_h, int out_w) {
  Image img;
  if (!decode_file(path, &img) || img.w <= 0 || img.h <= 0) return 1;
  if (img.h == out_h && img.w == out_w) {
    memcpy(out, img.data.data(), img.data.size());
  } else {
    resize_bilinear(img, out, out_h, out_w);
  }
  return 0;
}

// Decode a batch of images with a thread pool into (n, out_h, out_w, 3)
// RGB8. status[i] = 0 on success. Returns number of failures.
int imgloader_decode_batch(const char** paths, int n, uint8_t* out, int out_h,
                           int out_w, int n_threads, int* status) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> workers;
  const size_t stride = size_t(out_h) * out_w * 3;
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([=]() {
      for (int i = t; i < n; i += n_threads) {
        status[i] = imgloader_decode(paths[i], out + stride * i, out_h, out_w);
      }
    });
  }
  for (auto& w : workers) w.join();
  int failures = 0;
  for (int i = 0; i < n; ++i) failures += (status[i] != 0);
  return failures;
}

// Query a TIFF band's dimensions (w, h). Returns 0 on success.
int imgloader_band_size(const char* path, int* w, int* h) {
  TIFFSetWarningHandler(nullptr);
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return 1;
  uint32_t tw = 0, th = 0;
  TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &tw);
  TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &th);
  TIFFClose(tif);
  if (tw == 0 || th == 0) return 1;
  *w = int(tw);
  *h = int(th);
  return 0;
}

// Read one band (1-indexed) of a TIFF as raw float32 DN values into out,
// which must hold capacity floats (>= w*h from imgloader_band_size).
// Returns 0 on success.
int imgloader_read_band(const char* path, int band, float* out,
                        int64_t capacity) {
  std::vector<float> buf;
  int w = 0, h = 0;
  if (!read_band_f32(path, band, &buf, &w, &h)) return 1;
  if (int64_t(buf.size()) > capacity) return 2;
  memcpy(out, buf.data(), buf.size() * sizeof(float));
  return 0;
}

// Native grid crop: split an RGB8 image (h, w) into rows*cols equal tiles
// written to out (rows*cols, th, tw, 3) — the patch_cropper hot loop.
void imgloader_grid_crop(const uint8_t* img, int h, int w, int rows, int cols,
                         uint8_t* out) {
  const int th = h / rows, tw = w / cols;
  for (int r = 0; r < rows; ++r) {
    for (int c = 0; c < cols; ++c) {
      uint8_t* dst = out + (size_t(r) * cols + c) * th * tw * 3;
      for (int y = 0; y < th; ++y) {
        const uint8_t* src = img + ((size_t(r) * th + y) * w + size_t(c) * tw) * 3;
        memcpy(dst + size_t(y) * tw * 3, src, size_t(tw) * 3);
      }
    }
  }
}

}  // extern "C"
