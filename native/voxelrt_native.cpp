// voxelrt_native — C++ runtime components for the voxelrt framework.
//
// The reference delegates its native layer to the Taichi runtime (kernel
// JIT, field memory management, GGUI windowing — SURVEY.md L5). In the TPU
// build the *compute* path is JAX/XLA/Pallas; this extension provides the
// native runtime around it:
//
//   * build_occupancy(material, res, n_lods) — packed u32 occupancy mip
//     pyramid from the dense material grid (the data-management half of
//     renderer/raytracer.py:46-70), single pass, bit-parallel OR-reduce.
//   * encode_png(rgb, w, h) — zlib-backed PNG encoder with per-row filter
//     selection (the headless framebuffer IO path replacing GGUI).
//   * FrameWriter — a pthread worker that drains a queue of (path, image)
//     jobs so the render loop never blocks on disk IO (the presentation
//     executor of the app shell).
//
// Bound with the raw CPython C API (no pybind11 in this environment).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Occupancy pyramid
// ---------------------------------------------------------------------------

// material: res^3 int8 values indexed [x][y][z] (C-contiguous);
// output bit index within a LOD uses the z-major linearization
// (z*r + y)*r + x matching renderer/raytracer.py:33-38 and voxelrt.world.
static PyObject* build_occupancy(PyObject*, PyObject* args) {
  Py_buffer buf;
  int res, n_lods;
  if (!PyArg_ParseTuple(args, "y*ii", &buf, &res, &n_lods)) return nullptr;
  const int64_t n3 = static_cast<int64_t>(res) * res * res;
  if (buf.len < n3) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "material buffer too small");
    return nullptr;
  }
  const int8_t* mat = static_cast<const int8_t*>(buf.buf);

  int64_t total_bits = 0;
  std::vector<int64_t> bases(n_lods + 1, 0);
  for (int l = 0; l < n_lods; ++l) {
    int r = res >> l;
    bases[l + 1] = bases[l] + static_cast<int64_t>(r) * r * r;
  }
  total_bits = bases[n_lods];
  const int64_t n_words = (total_bits + 31) / 32;

  std::vector<uint32_t> words(static_cast<size_t>(n_words), 0u);

  // LOD 0: transpose [x][y][z] -> z-major bit order.
  {
    const int r = res;
    for (int z = 0; z < r; ++z) {
      for (int y = 0; y < r; ++y) {
        const int64_t row_bit = (static_cast<int64_t>(z) * r + y) * r;
        for (int x = 0; x < r; ++x) {
          if (mat[(static_cast<int64_t>(x) * r + y) * r + z] != 0) {
            const int64_t idx = row_bit + x;
            words[idx >> 5] |= (1u << (idx & 31));
          }
        }
      }
    }
  }
  // LOD k = OR of 8 children of LOD k-1.
  std::vector<uint8_t> prev(static_cast<size_t>(n3), 0);
  {
    const int r = res;
    for (int z = 0; z < r; ++z)
      for (int y = 0; y < r; ++y)
        for (int x = 0; x < r; ++x)
          prev[(static_cast<int64_t>(z) * r + y) * r + x] =
              mat[(static_cast<int64_t>(x) * r + y) * r + z] != 0;
  }
  for (int l = 1; l < n_lods; ++l) {
    const int r = res >> l;
    const int pr = r * 2;
    std::vector<uint8_t> cur(static_cast<size_t>(r) * r * r, 0);
    for (int z = 0; z < r; ++z) {
      for (int y = 0; y < r; ++y) {
        for (int x = 0; x < r; ++x) {
          uint8_t occ = 0;
          for (int dz = 0; dz < 2 && !occ; ++dz)
            for (int dy = 0; dy < 2 && !occ; ++dy)
              for (int dx = 0; dx < 2 && !occ; ++dx)
                occ |= prev[(static_cast<int64_t>(2 * z + dz) * pr +
                             (2 * y + dy)) * pr + (2 * x + dx)];
          if (occ) {
            const int64_t idx =
                bases[l] + (static_cast<int64_t>(z) * r + y) * r + x;
            words[idx >> 5] |= (1u << (idx & 31));
          }
          cur[(static_cast<int64_t>(z) * r + y) * r + x] = occ;
        }
      }
    }
    prev.swap(cur);
  }

  PyBuffer_Release(&buf);
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(words.data()),
      static_cast<Py_ssize_t>(words.size() * sizeof(uint32_t)));
}

// ---------------------------------------------------------------------------
// PNG encoder
// ---------------------------------------------------------------------------

static void put_u32(std::string& out, uint32_t v) {
  out.push_back(static_cast<char>((v >> 24) & 0xFF));
  out.push_back(static_cast<char>((v >> 16) & 0xFF));
  out.push_back(static_cast<char>((v >> 8) & 0xFF));
  out.push_back(static_cast<char>(v & 0xFF));
}

static void put_chunk(std::string& out, const char tag[4],
                      const std::string& data) {
  put_u32(out, static_cast<uint32_t>(data.size()));
  std::string td(tag, 4);
  td += data;
  out += td;
  uLong crc = crc32(0L, reinterpret_cast<const Bytef*>(td.data()),
                    static_cast<uInt>(td.size()));
  put_u32(out, static_cast<uint32_t>(crc));
}

// rgb: h*w*3 bytes, rows top-down.
static std::string encode_png_impl(const uint8_t* rgb, int w, int h,
                                   int level) {
  const int stride = w * 3;
  std::string raw;
  raw.resize(static_cast<size_t>(h) * (stride + 1));
  std::vector<uint8_t> sub(stride), up(stride);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = rgb + static_cast<int64_t>(y) * stride;
    const uint8_t* prev =
        y > 0 ? rgb + static_cast<int64_t>(y - 1) * stride : nullptr;
    // Pick between None / Sub / Up with the minimum-sum-abs heuristic.
    int64_t s_none = 0, s_sub = 0, s_up = 0;
    for (int i = 0; i < stride; ++i) {
      uint8_t a = i >= 3 ? row[i - 3] : 0;
      uint8_t b = prev ? prev[i] : 0;
      sub[i] = static_cast<uint8_t>(row[i] - a);
      up[i] = static_cast<uint8_t>(row[i] - b);
      s_none += row[i] < 128 ? row[i] : 256 - row[i];
      s_sub += sub[i] < 128 ? sub[i] : 256 - sub[i];
      s_up += up[i] < 128 ? up[i] : 256 - up[i];
    }
    char* dst = &raw[static_cast<size_t>(y) * (stride + 1)];
    if (s_sub <= s_none && s_sub <= s_up) {
      dst[0] = 1;
      memcpy(dst + 1, sub.data(), stride);
    } else if (s_up < s_none) {
      dst[0] = 2;
      memcpy(dst + 1, up.data(), stride);
    } else {
      dst[0] = 0;
      memcpy(dst + 1, row, stride);
    }
  }

  uLongf bound = compressBound(static_cast<uLong>(raw.size()));
  std::string idat;
  idat.resize(bound);
  compress2(reinterpret_cast<Bytef*>(&idat[0]), &bound,
            reinterpret_cast<const Bytef*>(raw.data()),
            static_cast<uLong>(raw.size()), level);
  idat.resize(bound);

  std::string out("\x89PNG\r\n\x1a\n", 8);
  std::string ihdr;
  put_u32(ihdr, static_cast<uint32_t>(w));
  put_u32(ihdr, static_cast<uint32_t>(h));
  ihdr.push_back(8);   // bit depth
  ihdr.push_back(2);   // RGB
  ihdr.push_back(0);
  ihdr.push_back(0);
  ihdr.push_back(0);
  put_chunk(out, "IHDR", ihdr);
  put_chunk(out, "IDAT", idat);
  put_chunk(out, "IEND", std::string());
  return out;
}

static PyObject* encode_png(PyObject*, PyObject* args) {
  Py_buffer buf;
  int w, h, level = 6;
  if (!PyArg_ParseTuple(args, "y*ii|i", &buf, &w, &h, &level)) return nullptr;
  if (buf.len < static_cast<int64_t>(w) * h * 3) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "rgb buffer too small");
    return nullptr;
  }
  std::string png;
  Py_BEGIN_ALLOW_THREADS
  png = encode_png_impl(static_cast<const uint8_t*>(buf.buf), w, h, level);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  return PyBytes_FromStringAndSize(png.data(),
                                   static_cast<Py_ssize_t>(png.size()));
}

// ---------------------------------------------------------------------------
// FrameWriter: async presentation executor
// ---------------------------------------------------------------------------

struct Job {
  std::string path;
  std::vector<uint8_t> rgb;
  int w, h;
};

struct FrameWriterState {
  std::deque<Job> queue;
  std::mutex mu;
  std::condition_variable cv;
  std::thread worker;
  std::atomic<bool> stop{false};
  std::atomic<int64_t> written{0};
};

typedef struct {
  PyObject_HEAD FrameWriterState* state;
} FrameWriterObject;

static void frame_writer_loop(FrameWriterState* st) {
  for (;;) {
    Job job;
    {
      std::unique_lock<std::mutex> lk(st->mu);
      st->cv.wait(lk, [&] { return st->stop.load() || !st->queue.empty(); });
      if (st->queue.empty()) {
        if (st->stop.load()) return;
        continue;
      }
      job = std::move(st->queue.front());
      st->queue.pop_front();
    }
    std::string png = encode_png_impl(job.rgb.data(), job.w, job.h, 6);
    FILE* f = fopen(job.path.c_str(), "wb");
    if (f) {
      fwrite(png.data(), 1, png.size(), f);
      fclose(f);
    }
    st->written.fetch_add(1);
    st->cv.notify_all();
  }
}

static PyObject* fw_new(PyTypeObject* type, PyObject*, PyObject*) {
  FrameWriterObject* self =
      reinterpret_cast<FrameWriterObject*>(type->tp_alloc(type, 0));
  if (!self) return nullptr;
  self->state = new FrameWriterState();
  self->state->worker = std::thread(frame_writer_loop, self->state);
  return reinterpret_cast<PyObject*>(self);
}

static void fw_dealloc(FrameWriterObject* self) {
  if (self->state) {
    self->state->stop.store(true);
    self->state->cv.notify_all();
    if (self->state->worker.joinable()) self->state->worker.join();
    delete self->state;
  }
  Py_TYPE(self)->tp_free(reinterpret_cast<PyObject*>(self));
}

static PyObject* fw_submit(FrameWriterObject* self, PyObject* args) {
  const char* path;
  Py_buffer buf;
  int w, h;
  if (!PyArg_ParseTuple(args, "sy*ii", &path, &buf, &w, &h)) return nullptr;
  Job job;
  job.path = path;
  job.w = w;
  job.h = h;
  const uint8_t* p = static_cast<const uint8_t*>(buf.buf);
  job.rgb.assign(p, p + static_cast<int64_t>(w) * h * 3);
  PyBuffer_Release(&buf);
  {
    std::lock_guard<std::mutex> lk(self->state->mu);
    self->state->queue.push_back(std::move(job));
  }
  self->state->cv.notify_all();
  Py_RETURN_NONE;
}

static PyObject* fw_drain(FrameWriterObject* self, PyObject*) {
  Py_BEGIN_ALLOW_THREADS {
    std::unique_lock<std::mutex> lk(self->state->mu);
    self->state->cv.wait(lk, [&] { return self->state->queue.empty(); });
  }
  Py_END_ALLOW_THREADS
  Py_RETURN_NONE;
}

static PyObject* fw_written(FrameWriterObject* self, PyObject*) {
  return PyLong_FromLongLong(self->state->written.load());
}

static PyMethodDef fw_methods[] = {
    {"submit", reinterpret_cast<PyCFunction>(fw_submit), METH_VARARGS,
     "submit(path, rgb_bytes, w, h): queue a frame for async PNG write"},
    {"drain", reinterpret_cast<PyCFunction>(fw_drain), METH_NOARGS,
     "block until the queue is empty"},
    {"written", reinterpret_cast<PyCFunction>(fw_written), METH_NOARGS,
     "number of frames written so far"},
    {nullptr, nullptr, 0, nullptr}};

static PyTypeObject FrameWriterType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
};

// ---------------------------------------------------------------------------

static PyMethodDef module_methods[] = {
    {"build_occupancy", build_occupancy, METH_VARARGS,
     "build_occupancy(material_bytes, res, n_lods) -> packed u32 words"},
    {"encode_png", encode_png, METH_VARARGS,
     "encode_png(rgb_bytes_topdown, w, h, level=6) -> png bytes"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "voxelrt_native",
    "Native runtime components for voxelrt", -1, module_methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_voxelrt_native(void) {
  FrameWriterType.tp_name = "voxelrt_native.FrameWriter";
  FrameWriterType.tp_basicsize = sizeof(FrameWriterObject);
  FrameWriterType.tp_flags = Py_TPFLAGS_DEFAULT;
  FrameWriterType.tp_doc = "Async PNG frame writer (worker thread)";
  FrameWriterType.tp_new = fw_new;
  FrameWriterType.tp_dealloc = reinterpret_cast<destructor>(fw_dealloc);
  FrameWriterType.tp_methods = fw_methods;
  if (PyType_Ready(&FrameWriterType) < 0) return nullptr;

  PyObject* m = PyModule_Create(&moduledef);
  if (!m) return nullptr;
  Py_INCREF(&FrameWriterType);
  PyModule_AddObject(m, "FrameWriter",
                     reinterpret_cast<PyObject*>(&FrameWriterType));
  return m;
}
