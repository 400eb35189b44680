// Fast native serializers for libclsph_tpu frame export.
//
// The reference's exporter is native C++ (HoudiniFileDumpParticles,
// util/houdini_geo/HoudiniFileDumpHelper.cpp:19-90, driven by
// houdini_file_saver.cpp:25-92). This module is its TPU-framework
// equivalent: a CPython extension that formats and writes a whole
// PGEOMETRY V5 frame in one C pass — ~20x faster than the NumPy
// string-kernel fallback at millions of particles, which matters
// because export overlaps device compute on the async saver thread.
//
// Exposed functions (module _libclsph_native):
//   write_geo(path, positions, velocities, colors, mass) -> None
//   format_float(x) -> str   (test hook: the %g formatting used)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ostream<<float default formatting == printf %g (6 significant
// digits, shortest form) — matches the Python fallback and the
// reference's output.
static inline int fmt_g(char* buf, double v) {
  return snprintf(buf, 32, "%g", v);
}

struct BufferGuard {
  Py_buffer view{};
  bool ok = false;
  ~BufferGuard() {
    if (ok) PyBuffer_Release(&view);
  }
};

static bool get_f32_buffer(PyObject* obj, BufferGuard* g, Py_ssize_t* n,
                           const char* name) {
  if (PyObject_GetBuffer(obj, &g->view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) != 0) {
    return false;
  }
  g->ok = true;
  if (g->view.itemsize != 4 || !g->view.format ||
      strcmp(g->view.format, "f") != 0) {
    PyErr_Format(PyExc_TypeError, "%s must be a C-contiguous float32 array",
                 name);
    return false;
  }
  if (g->view.ndim != 2 || g->view.shape[1] != 3) {
    PyErr_Format(PyExc_TypeError, "%s must have shape (N, 3)", name);
    return false;
  }
  *n = g->view.shape[0];
  return true;
}

static PyObject* write_geo(PyObject*, PyObject* args) {
  const char* path;
  PyObject *pos_obj, *vel_obj, *col_obj;
  double mass;
  if (!PyArg_ParseTuple(args, "sOOOd", &path, &pos_obj, &vel_obj, &col_obj,
                        &mass)) {
    return nullptr;
  }

  BufferGuard pos_g, vel_g, col_g;
  Py_ssize_t n = 0, nv = 0, nc = 0;
  if (!get_f32_buffer(pos_obj, &pos_g, &n, "positions")) return nullptr;
  if (!get_f32_buffer(vel_obj, &vel_g, &nv, "velocities")) return nullptr;
  if (!get_f32_buffer(col_obj, &col_g, &nc, "colors")) return nullptr;
  if (nv != n || nc != n) {
    PyErr_SetString(PyExc_ValueError, "array lengths differ");
    return nullptr;
  }

  const float* pos = static_cast<const float*>(pos_g.view.buf);
  const float* vel = static_cast<const float*>(vel_g.view.buf);
  const float* col = static_cast<const float*>(col_g.view.buf);

  std::string out;
  char mass_s[32];
  fmt_g(mass_s, mass);

  PyThreadState* save = PyEval_SaveThread();  // release the GIL

  // ~96 bytes/line typical; headroom avoids re-allocs
  out.reserve(static_cast<size_t>(n) * 110 + static_cast<size_t>(n) * 9 + 512);

  char line[512];
  int len = snprintf(line, sizeof(line),
                     "PGEOMETRY V5\n"
                     "NPoints %zd NPrims 1\n"
                     "NPointGroups 0 NPrimGroups 1\n"
                     "NPointAttrib 3 NVertexAttrib 0 NPrimAttrib 2 NAttrib 0\n"
                     "PointAttrib\n"
                     "v 3 float 1 1 1\n"
                     "color 3 float 1 1 1\n"
                     "mass 1 float 1\n",
                     n);
  out.append(line, len);

  // point lines: "px py pz 0 (vx vy vz\tcr cg cb\tmass)"
  for (Py_ssize_t i = 0; i < n; ++i) {
    char* p = line;
    const float* pp = pos + 3 * i;
    const float* vv = vel + 3 * i;
    const float* cc = col + 3 * i;
    p += fmt_g(p, pp[0]); *p++ = ' ';
    p += fmt_g(p, pp[1]); *p++ = ' ';
    p += fmt_g(p, pp[2]);
    memcpy(p, " 0 (", 4); p += 4;
    p += fmt_g(p, vv[0]); *p++ = ' ';
    p += fmt_g(p, vv[1]); *p++ = ' ';
    p += fmt_g(p, vv[2]); *p++ = '\t';
    p += fmt_g(p, cc[0]); *p++ = ' ';
    p += fmt_g(p, cc[1]); *p++ = ' ';
    p += fmt_g(p, cc[2]); *p++ = '\t';
    size_t ml = strlen(mass_s);
    memcpy(p, mass_s, ml); p += ml;
    *p++ = ')'; *p++ = '\n';
    out.append(line, p - line);
  }

  out.append("PrimitiveAttrib\n"
             "generator 1 index 1 location1\n"
             "dopobject 1 index 1 /obj/AutoDopNetwork:1\n");
  len = snprintf(line, sizeof(line), "Part %zd", n);
  out.append(line, len);
  for (Py_ssize_t i = 0; i < n; ++i) {
    len = snprintf(line, sizeof(line), " %zd", i);
    out.append(line, len);
  }
  out.append(" [0\t0]\n"
             "box_object1 unordered\n"
             "1 1\n"
             "beginExtra\n"
             "endExtra\n");

  FILE* f = fopen(path, "wb");
  bool write_ok = false;
  if (f) {
    write_ok = fwrite(out.data(), 1, out.size(), f) == out.size();
    fclose(f);
  }

  PyEval_RestoreThread(save);

  if (!f) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }
  if (!write_ok) {
    PyErr_Format(PyExc_OSError, "short write to %s", path);
    return nullptr;
  }
  Py_RETURN_NONE;
}

static PyObject* format_float(PyObject*, PyObject* args) {
  double v;
  if (!PyArg_ParseTuple(args, "d", &v)) return nullptr;
  char buf[32];
  fmt_g(buf, v);
  return PyUnicode_FromString(buf);
}

static PyMethodDef Methods[] = {
    {"write_geo", write_geo, METH_VARARGS,
     "write_geo(path, positions, velocities, colors, mass)"},
    {"format_float", format_float, METH_VARARGS, "%g formatting test hook"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef Module = {
    PyModuleDef_HEAD_INIT, "_libclsph_native",
    "Native serializers for libclsph_tpu", -1, Methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__libclsph_native(void) {
  return PyModule_Create(&Module);
}
