// Native host-IO codec for the data loader and serving paths.
//
// The reference delegates image decode/encode to PIL inside torch
// DataLoader worker processes and its serving loop (its only "native"
// infrastructure is torch's C++ loader machinery). Here:
//   - gvr_decode_jpeg: libjpeg decode that releases the GIL for the
//     thread-pool loader and skips PIL's Python-object overhead. Decode
//     only — all resizing/augmentation happens on the TPU
//     (data/augment.py); callers fall back to PIL for non-JPEG inputs.
//   - gvr_encode_jpeg: the submission contract's JPEG writer (quality 95,
//     4:4:4, optimized Huffman — reference generate_folder.py:248-250),
//     GIL-free so the generate_folder write pool threads across cores.
//   - gvr_crc32c: Castagnoli CRC for TFRecord framing (data/tfrecord.py);
//     the byte-at-a-time loop is far too slow in pure Python.
//
// Build: g++ -O2 -shared -fPIC -o libgvrnative.so codec.cpp -ljpeg
// (done on demand by data/native_loader.py).

#include <csetjmp>
#include <cstdio>
#include <cstdlib>
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

// Encodes h*w*3 row-major RGB bytes as JPEG into the caller-allocated
// buffer `out` (capacity `out_capacity`). quality in [1,100]; subsamp444
// nonzero forces 4:4:4 chroma (the reference's `subsampling=0` PIL
// setting); optimize nonzero enables optimized Huffman tables (the
// reference's `optimize=True`). Returns the encoded size on success,
// -1 on codec error, -2 if the output exceeded out_capacity.
long gvr_encode_jpeg(const unsigned char* rgb, int h, int w, int quality,
                     int subsamp444, int optimize, unsigned char* out,
                     unsigned long out_capacity) {
  jpeg_compress_struct cinfo;
  ErrorMgr jerr;
  // The output buffer slot lives on the heap, NOT in an automatic local:
  // jpeg_mem_dest rewrites the slot after setjmp, and a non-volatile
  // automatic modified between setjmp and longjmp is indeterminate in the
  // error path (the compiler may keep the pre-setjmp nullptr in a register
  // — leaking the libjpeg buffer — or free a clobbered value). Only the
  // POINTER to the slot is read after longjmp, and it is set before setjmp
  // and never changed.
  struct MemBuf { unsigned char* buf; unsigned long size; };
  MemBuf* mem = static_cast<MemBuf*>(calloc(1, sizeof(MemBuf)));
  if (!mem) return -1;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.emit_message = emit_nothing;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_compress(&cinfo);
    if (mem->buf) free(mem->buf);
    free(mem);
    return -1;
  }

  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &mem->buf, &mem->size);
  cinfo.image_width = static_cast<JDIMENSION>(w);
  cinfo.image_height = static_cast<JDIMENSION>(h);
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.optimize_coding = optimize ? TRUE : FALSE;
  if (subsamp444) {
    for (int c = 0; c < cinfo.num_components; ++c) {
      cinfo.comp_info[c].h_samp_factor = 1;
      cinfo.comp_info[c].v_samp_factor = 1;
    }
  }
  jpeg_start_compress(&cinfo, TRUE);
  const long stride = static_cast<long>(w) * 3;
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW rows[1] = {
        const_cast<unsigned char*>(rgb) + cinfo.next_scanline * stride};
    jpeg_write_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);

  long rc;
  if (mem->size <= out_capacity) {
    memcpy(out, mem->buf, mem->size);
    rc = static_cast<long>(mem->size);
  } else {
    rc = -2;
  }
  free(mem->buf);
  free(mem);
  return rc;
}

namespace {

// CRC32C (Castagnoli, reflected poly 0x82F63B78) — TFRecord framing
// checksums. Table built once, thread-safely, at first use.
unsigned int kCrcTable[256];
bool BuildCrcTable() {
  for (unsigned int i = 0; i < 256; ++i) {
    unsigned int c = i;
    for (int k = 0; k < 8; ++k)
      c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
    kCrcTable[i] = c;
  }
  return true;
}
const bool kCrcTableBuilt = BuildCrcTable();

}  // namespace

// Running CRC32C: pass crc=0 for a fresh checksum, or a previous return
// value to continue one.
unsigned int gvr_crc32c(const unsigned char* data, unsigned long size,
                        unsigned int crc) {
  (void)kCrcTableBuilt;
  crc = ~crc;
  for (unsigned long i = 0; i < size; ++i)
    crc = kCrcTable[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return ~crc;
}

int gvr_version() { return 3; }

}  // extern "C"
