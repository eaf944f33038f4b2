// Native TUM RGB-D dataset loader with multithreaded prefetch.
//
// The engine's host-sequential IO path, replacing the reference's in-loop
// cv::imread (/root/reference/Examples/RGB-D/rgbd_my.cpp:90-96) with a
// producer pool that decodes ahead of the tracker: PNG grayscale + 16-bit
// depth decode via libpng/libjpeg, a bounded ring of pre-decoded frames,
// and a zero-copy handoff into caller-provided buffers (the jax device_put
// uploads straight from them).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).
//
// Build: make -C plslam_tpu/native   (produces libplslam_io.so)

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

extern "C" {
#include <jpeglib.h>
}

namespace {

struct Frame {
  std::vector<float> gray;   // H*W, 0..255
  std::vector<float> depth;  // H*W, metres
  double timestamp = 0.0;
  int width = 0, height = 0;
  bool ok = false;
};

bool ends_with(const std::string& s, const std::string& suf) {
  return s.size() >= suf.size() &&
         s.compare(s.size() - suf.size(), suf.size(), suf) == 0;
}

// ---- PNG ------------------------------------------------------------------
bool decode_png(const std::string& path, std::vector<uint16_t>& out, int& w,
                int& h, int& channels, int& bit_depth) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  w = png_get_image_width(png, info);
  h = png_get_image_height(png, info);
  bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);
  channels = png_get_channels(png, info);
  bit_depth = png_get_bit_depth(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<uint8_t> raw((size_t)h * rowbytes);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = raw.data() + (size_t)y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);

  out.resize((size_t)w * h * channels);
  if (bit_depth == 16) {
    // PNG is big-endian
    for (size_t i = 0; i < out.size(); ++i)
      out[i] = (uint16_t)((raw[2 * i] << 8) | raw[2 * i + 1]);
  } else {
    for (size_t i = 0; i < out.size(); ++i) out[i] = raw[i];
  }
  return true;
}

// ---- JPEG -----------------------------------------------------------------
bool decode_jpeg(const std::string& path, std::vector<uint16_t>& out, int& w,
                 int& h, int& channels) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  channels = cinfo.output_components;
  out.resize((size_t)w * h * channels);
  std::vector<uint8_t> row((size_t)w * channels);
  uint8_t* rp = row.data();
  for (int y = 0; y < h; ++y) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    for (size_t i = 0; i < row.size(); ++i)
      out[(size_t)y * w * channels + i] = row[i];
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

struct Loader {
  std::vector<double> timestamps;
  std::vector<std::string> rgb_paths, depth_paths;
  double depth_factor = 5000.0;
  size_t next_submit = 0;   // next index the workers will take
  size_t next_emit = 0;     // next index the consumer wants
  size_t queue_cap = 8;
  std::deque<std::pair<size_t, Frame>> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  Frame load_one(size_t i) {
    Frame f;
    f.timestamp = timestamps[i];
    std::vector<uint16_t> rgb_raw, d_raw;
    int w, h, c, bd;
    const std::string& rp = rgb_paths[i];
    bool ok1 = ends_with(rp, ".png") || ends_with(rp, ".PNG")
                   ? decode_png(rp, rgb_raw, w, h, c, bd)
                   : decode_jpeg(rp, rgb_raw, w, h, c);
    if (!ok1) return f;
    f.width = w;
    f.height = h;
    f.gray.resize((size_t)w * h);
    if (c >= 3) {
      for (size_t p = 0; p < f.gray.size(); ++p) {
        // OpenCV BGR? files are RGB; grayscale per ITU-R BT.601 like cv2
        float r = rgb_raw[p * c + 0], g = rgb_raw[p * c + 1],
              b = rgb_raw[p * c + 2];
        f.gray[p] = 0.299f * r + 0.587f * g + 0.114f * b;
      }
    } else {
      for (size_t p = 0; p < f.gray.size(); ++p) f.gray[p] = rgb_raw[p];
    }
    int dw, dh, dc, dbd;
    if (!decode_png(depth_paths[i], d_raw, dw, dh, dc, dbd)) return f;
    if (dw != w || dh != h) return f;
    f.depth.resize((size_t)w * h);
    const float inv = 1.0f / (float)depth_factor;
    for (size_t p = 0; p < f.depth.size(); ++p)
      f.depth[p] = (float)d_raw[p * dc] * inv;
    f.ok = true;
    return f;
  }

  void worker() {
    for (;;) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop || (next_submit < timestamps.size() &&
                          next_submit < next_emit + queue_cap);
        });
        if (stop || next_submit >= timestamps.size()) return;
        idx = next_submit++;
      }
      Frame f = load_one(idx);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready.emplace_back(idx, std::move(f));
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* loader_create(const char* assoc_path, const char* root,
                    double depth_factor, int n_threads, int queue) {
  auto* L = new Loader();
  L->depth_factor = depth_factor;
  L->queue_cap = queue > 0 ? (size_t)queue : 8;
  std::ifstream f(assoc_path);
  if (!f) {
    delete L;
    return nullptr;
  }
  std::string line, base(root);
  if (!base.empty() && base.back() != '/') base += '/';
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    double ts, ts2;
    std::string rgb, depth;
    if (!(ss >> ts >> rgb >> ts2 >> depth)) continue;
    L->timestamps.push_back(ts);
    L->rgb_paths.push_back(rgb[0] == '/' ? rgb : base + rgb);
    L->depth_paths.push_back(depth[0] == '/' ? depth : base + depth);
  }
  int nt = n_threads > 0 ? n_threads : 4;
  for (int i = 0; i < nt; ++i)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

int loader_size(void* h) {
  return (int)static_cast<Loader*>(h)->timestamps.size();
}

// Copies the next frame (in order) into the caller's buffers.
// Returns: 1 ok, 0 end of sequence, -1 decode failure (frame skipped).
int loader_next(void* h, float* gray, float* depth, double* ts, int* w,
                int* hgt) {
  auto* L = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_emit >= L->timestamps.size()) return 0;
  size_t want = L->next_emit;
  L->cv_ready.wait(lk, [&] {
    for (auto& kv : L->ready)
      if (kv.first == want) return true;
    return false;
  });
  Frame fr;
  for (auto it = L->ready.begin(); it != L->ready.end(); ++it) {
    if (it->first == want) {
      fr = std::move(it->second);
      L->ready.erase(it);
      break;
    }
  }
  L->next_emit++;
  lk.unlock();
  L->cv_space.notify_all();
  if (!fr.ok) return -1;
  std::memcpy(gray, fr.gray.data(), fr.gray.size() * sizeof(float));
  std::memcpy(depth, fr.depth.data(), fr.depth.size() * sizeof(float));
  *ts = fr.timestamp;
  *w = fr.width;
  *hgt = fr.height;
  return 1;
}

void loader_destroy(void* h) {
  auto* L = static_cast<Loader*>(h);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_space.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
