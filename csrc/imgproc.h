// Native host image pipeline for yolov8_vit_tpu.
//
// TPU-native equivalent of the runtime the reference vendors as C++/TensorRT
// (csrc/detect demo + cv2 host preprocessing, documented at
// /root/reference/docs/YOLO_TensorRT_Technical.md:232-286): JPEG/PNG decode,
// cv2-semantics letterbox, and a multithreaded batch loader that feeds the
// XLA device queue.  Exposed through an extern "C" ABI consumed via ctypes
// (runtime/native.py).
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace mt {

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;          // always 3 (RGB) after decode
  std::vector<uint8_t> data; // HWC row-major
  bool ok() const { return width > 0 && height > 0 && !data.empty(); }
};

// Decode JPEG/PNG/PPM/BMP by magic bytes. Returns empty image on failure.
Image DecodeImageFile(const std::string& path);

// Letterbox geometry (matches ops/letterbox.py letterbox_params).
struct LetterboxInfo {
  float ratio = 1.f;
  float dw = 0.f;
  float dh = 0.f;
};

// Aspect-preserving bilinear resize (half-pixel centers, edge clamp — cv2
// INTER_LINEAR float semantics) + pad with `pad_value` to (out_w, out_h).
// Output NHWC uint8 written to `dst` (out_h*out_w*3 bytes).
LetterboxInfo LetterboxU8(const Image& src, int out_w, int out_h,
                          uint8_t pad_value, uint8_t* dst);

// Nearest crop-resize: exact-rational source mapping (ops/crop.py contract).
// Box is integer xyxy clamped to the image. dst is out_h*out_w*3.
// The raw-pointer form reads a borrowed HWC u8 view (no frame copy).
void CropResizeNearestU8(const uint8_t* src, int width, int height,
                         int x1, int y1, int x2, int y2,
                         int out_w, int out_h, uint8_t* dst);
void CropResizeNearestU8(const Image& src, int x1, int y1, int x2, int y2,
                         int out_w, int out_h, uint8_t* dst);

// Parallel batch load: decode+letterbox `n` files into a preallocated
// NHWC buffer (n*out_h*out_w*3). infos receives per-image geometry;
// ok[i]=1 when image i decoded. Returns number decoded.
int LoadLetterboxBatch(const std::vector<std::string>& paths, int out_w,
                       int out_h, uint8_t pad_value, int num_threads,
                       uint8_t* dst, LetterboxInfo* infos, uint8_t* ok);

}  // namespace mt
