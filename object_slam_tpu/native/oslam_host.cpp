// Native host runtime: threaded image decode + frame prefetch pipeline.
//
// The reference performs per-frame disk IO inline on the tracking thread
// (cv::imread of RGB/depth in Examples/RGB-D/rgbd_tum.cc:99-107 and of
// instance masks in src/Semantic.cc:45,88) — decode latency lands on the
// camera-rate critical path. This runtime moves ingestion off that path:
// a pthread worker pool decodes PNG (libpng: gray8 / gray16 depth / RGB8)
// and JPEG (libjpeg) into per-frame slabs, a bounded in-order queue hands
// completed frames to the tracking loop, and buffers are recycled.
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (object_slam_tpu/native/loader.py). No Python.h dependency — the
// interpreter never blocks on decode.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <png.h>
#include <jpeglib.h>
#include <csetjmp>

namespace {

// ---------------------------------------------------------------------------
// Decoders
// ---------------------------------------------------------------------------

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;   // 1 or 3
  int bit_depth = 8;  // 8 or 16
  std::vector<uint8_t> data;  // row-major, native endian for 16-bit
};

bool decode_png_file(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  unsigned char header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                           nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  if (bit_depth == 16) png_set_swap(png);  // little-endian host order
  png_read_update_info(png, info);

  color_type = png_get_color_type(png, info);
  bit_depth = png_get_bit_depth(png, info);
  int channels = png_get_channels(png, info);

  out->width = static_cast<int>(w);
  out->height = static_cast<int>(h);
  out->channels = channels;
  out->bit_depth = bit_depth;
  size_t rowbytes = png_get_rowbytes(png, info);
  out->data.resize(rowbytes * h);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg_file(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  out->width = cinfo.output_width;
  out->height = cinfo.output_height;
  out->channels = cinfo.output_components;
  out->bit_depth = 8;
  size_t row = static_cast<size_t>(out->width) * out->channels;
  out->data.resize(row * out->height);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* ptr = out->data.data() + cinfo.output_scanline * row;
    jpeg_read_scanlines(&cinfo, &ptr, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

bool decode_any(const char* path, Image* out) {
  size_t n = strlen(path);
  if (n > 4 && (strcasecmp(path + n - 4, ".jpg") == 0 ||
                strcasecmp(path + n - 5, ".jpeg") == 0))
    return decode_jpeg_file(path, out);
  return decode_png_file(path, out);
}

// ---------------------------------------------------------------------------
// Frame prefetch pipeline
// ---------------------------------------------------------------------------

struct FrameRequest {
  int frame_id;
  std::string rgb_path;
  std::string depth_path;            // empty -> none
  std::vector<std::string> mask_paths;
};

struct FrameResult {
  int frame_id = -1;
  bool ok = false;
  Image rgb;
  Image depth;
  std::vector<Image> masks;
};

class Loader {
 public:
  Loader(int n_workers, int capacity) : capacity_(capacity), stop_(false) {
    for (int i = 0; i < n_workers; ++i)
      workers_.emplace_back([this] { this->Work(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_req_.notify_all();
    cv_done_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Non-blocking: requests are cheap (paths only). Backpressure applies to
  // DECODED results — workers pause when `capacity` frames sit unconsumed,
  // so memory stays bounded while the consumer may submit the whole
  // sequence up front.
  bool Submit(FrameRequest req) {
    std::lock_guard<std::mutex> lk(mu_);
    if (stop_) return false;
    pending_.push_back(std::move(req));
    cv_req_.notify_one();
    return true;
  }

  // Blocks until the given frame id is decoded; transfers ownership.
  // The waited id is decoded even when the result buffer is full (priority
  // bypass) so arbitrary get-order cannot deadlock against backpressure.
  bool Wait(int frame_id, FrameResult* out) {
    std::unique_lock<std::mutex> lk(mu_);
    priority_id_ = frame_id;
    cv_req_.notify_all();
    cv_done_.wait(lk, [this, frame_id] {
      return stop_ || done_.count(frame_id) > 0;
    });
    priority_id_ = -1;
    if (stop_ && !done_.count(frame_id)) return false;
    *out = std::move(done_[frame_id]);
    done_.erase(frame_id);
    cv_req_.notify_all();   // room for workers to decode ahead again
    return true;
  }

 private:
  void Work() {
    for (;;) {
      FrameRequest req;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_req_.wait(lk, [this] {
          if (stop_) return true;
          if (pending_.empty()) return false;
          if (static_cast<int>(done_.size()) + in_flight_ < capacity_)
            return true;
          // priority bypass: the consumer is blocked on a specific frame
          for (const auto& r : pending_)
            if (r.frame_id == priority_id_) return true;
          return false;
        });
        if (stop_) return;
        // pick the priority frame if present, else FIFO
        auto it = pending_.begin();
        if (priority_id_ >= 0)
          for (auto p = pending_.begin(); p != pending_.end(); ++p)
            if (p->frame_id == priority_id_) { it = p; break; }
        req = std::move(*it);
        pending_.erase(it);
        ++in_flight_;
      }
      FrameResult res;
      res.frame_id = req.frame_id;
      res.ok = decode_any(req.rgb_path.c_str(), &res.rgb);
      if (res.ok && !req.depth_path.empty())
        res.ok = decode_any(req.depth_path.c_str(), &res.depth);
      res.masks.resize(req.mask_paths.size());
      for (size_t i = 0; i < req.mask_paths.size() && res.ok; ++i)
        res.ok = decode_any(req.mask_paths[i].c_str(), &res.masks[i]);
      {
        std::lock_guard<std::mutex> lk(mu_);
        done_[req.frame_id] = std::move(res);
        --in_flight_;
      }
      cv_done_.notify_all();
    }
  }

  int capacity_;
  bool stop_;
  int in_flight_ = 0;
  int priority_id_ = -1;
  std::mutex mu_;
  std::condition_variable cv_req_, cv_done_;
  std::deque<FrameRequest> pending_;
  std::unordered_map<int, FrameResult> done_;
  std::vector<std::thread> workers_;
};

std::mutex g_results_mu;
std::unordered_map<int64_t, FrameResult> g_results;  // key: (loader, frame)
int64_t ResultKey(void* loader, int frame_id) {
  return (reinterpret_cast<int64_t>(loader) << 20) ^ frame_id;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* oslam_loader_create(int n_workers, int capacity) {
  return new Loader(n_workers, capacity);
}

void oslam_loader_destroy(void* loader) {
  delete static_cast<Loader*>(loader);
}

int oslam_submit(void* loader, int frame_id, const char* rgb_path,
                 const char* depth_path, const char** mask_paths,
                 int n_masks) {
  FrameRequest req;
  req.frame_id = frame_id;
  req.rgb_path = rgb_path ? rgb_path : "";
  req.depth_path = depth_path ? depth_path : "";
  for (int i = 0; i < n_masks; ++i) req.mask_paths.emplace_back(mask_paths[i]);
  return static_cast<Loader*>(loader)->Submit(std::move(req)) ? 0 : -1;
}

// Waits for a frame; returns 0 on success and fills the descriptor arrays.
// Buffers stay owned by the runtime until oslam_release(frame_id).
int oslam_wait(void* loader, int frame_id,
               uint8_t** rgb, int* rgb_h, int* rgb_w, int* rgb_c,
               uint8_t** depth, int* depth_h, int* depth_w, int* depth_bits,
               uint8_t** masks, int* mask_h, int* mask_w, int* n_masks,
               int max_masks) {
  FrameResult res;
  if (!static_cast<Loader*>(loader)->Wait(frame_id, &res) || !res.ok)
    return -1;
  int64_t key = ResultKey(loader, frame_id);
  std::lock_guard<std::mutex> lk(g_results_mu);
  FrameResult& stored = g_results[key] = std::move(res);
  *rgb = stored.rgb.data.data();
  *rgb_h = stored.rgb.height;
  *rgb_w = stored.rgb.width;
  *rgb_c = stored.rgb.channels;
  if (stored.depth.data.empty()) {
    *depth = nullptr;
    *depth_h = *depth_w = *depth_bits = 0;
  } else {
    *depth = stored.depth.data.data();
    *depth_h = stored.depth.height;
    *depth_w = stored.depth.width;
    *depth_bits = stored.depth.bit_depth;
  }
  int nm = static_cast<int>(stored.masks.size());
  if (nm > max_masks) nm = max_masks;
  *n_masks = nm;
  for (int i = 0; i < nm; ++i) {
    masks[i] = stored.masks[i].data.data();
    mask_h[i] = stored.masks[i].height;
    mask_w[i] = stored.masks[i].width;
  }
  return 0;
}

void oslam_release(void* loader, int frame_id) {
  std::lock_guard<std::mutex> lk(g_results_mu);
  g_results.erase(ResultKey(loader, frame_id));
}

// One-shot synchronous decode (tests / simple paths).
int oslam_decode(const char* path, uint8_t* out, int out_capacity,
                 int* h, int* w, int* c, int* bits) {
  Image img;
  if (!decode_any(path, &img)) return -1;
  *h = img.height;
  *w = img.width;
  *c = img.channels;
  *bits = img.bit_depth;
  int need = static_cast<int>(img.data.size());
  if (need > out_capacity) return -need;
  memcpy(out, img.data.data(), need);
  return need;
}

}  // extern "C"
