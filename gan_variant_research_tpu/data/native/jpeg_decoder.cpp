// Native JPEG decode fast path for the training data loader.
//
// The reference delegates image decode to PIL inside torch DataLoader
// worker processes (its only "native" infrastructure is torch's C++
// loader machinery). Here a small libjpeg-based decoder releases the GIL
// for the thread-pool loader and skips PIL's Python-object overhead.
// Decode only — all resizing/augmentation happens on the TPU
// (data/augment.py); callers fall back to PIL for non-JPEG or exotic
// color spaces.
//
// Build: g++ -O2 -shared -fPIC -o libgvrjpeg.so jpeg_decoder.cpp -ljpeg
// (done on demand by data/native_loader.py).

#include <csetjmp>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

void emit_nothing(j_common_ptr, int) {}

}  // namespace

extern "C" {

// Returns 0 on success; fills out (row-major RGB, h*w*3 bytes, caller
// allocated with capacity max_h*max_w*3) and *out_h/*out_w.
// Returns -1 on decode error, -2 if the image exceeds (max_h, max_w),
// -3 if the color space cannot be converted to RGB.
int gvr_decode_jpeg(const unsigned char* data, unsigned long size,
                    unsigned char* out, int max_h, int max_w,
                    int* out_h, int* out_w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.emit_message = emit_nothing;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), size);
  jpeg_read_header(&cinfo, TRUE);

  cinfo.out_color_space = JCS_RGB;  // libjpeg converts gray/YCbCr to RGB
  if (cinfo.jpeg_color_space == JCS_CMYK ||
      cinfo.jpeg_color_space == JCS_YCCK) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }

  jpeg_start_decompress(&cinfo);
  const int h = static_cast<int>(cinfo.output_height);
  const int w = static_cast<int>(cinfo.output_width);
  if (h > max_h || w > max_w || cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return (h > max_h || w > max_w) ? -2 : -3;
  }

  const int stride = w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out + static_cast<long>(cinfo.output_scanline) * stride;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_h = h;
  *out_w = w;
  return 0;
}

int gvr_version() { return 1; }

}  // extern "C"
