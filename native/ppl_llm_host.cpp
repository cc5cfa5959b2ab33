// Native host-side data structures for the TPU serving engine.
//
// C++ equivalents of the reference's ppl.common allocator stack
// (SURVEY.md E4): CompactAddrManager-backed IndexManager
// (src/utils/index_manager.h), PageManager, and the refcounted LRU
// PrefixCacheManager (src/utils/prefix_cache_manager.h). The Python
// classes in ppl/llm/serving_tpu/utils/ are the reference implementations;
// these are drop-in replacements selected at import time (utils/_native.py)
// keeping the scheduler's admission path allocation-cost-free at large
// batch counts.
//
// Build: python native/setup.py build_ext (wired through setup.py /
// make -C native).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <list>
#include <map>
#include <new>
#include <unordered_map>
#include <vector>

namespace {

constexpr int64_t kInvalidIndex = INT64_MAX;

// ---------------------------------------------------------------------------
// IndexManager: contiguous range allocator, address-ordered free map with
// coalescing, best-fit. (reference: CompactAddrManager)
// ---------------------------------------------------------------------------
class IndexManagerImpl {
 public:
  void Init(int64_t capacity) {
    capacity_ = capacity;
    free_.clear();
    avail_ = capacity;
    if (capacity > 0) free_[0] = capacity;
  }

  int64_t Alloc(int64_t size) {
    if (size <= 0) return kInvalidIndex;
    auto best = free_.end();
    int64_t best_size = INT64_MAX;
    for (auto it = free_.begin(); it != free_.end(); ++it) {
      if (it->second >= size && it->second < best_size) {
        best = it;
        best_size = it->second;
        if (best_size == size) break;
      }
    }
    if (best == free_.end()) return kInvalidIndex;
    int64_t start = best->first;
    int64_t blk = best->second;
    free_.erase(best);
    if (blk > size) free_[start + size] = blk - size;
    avail_ -= size;
    return start;
  }

  void FreeTracked(int64_t start, int64_t size) {
    if (size <= 0) return;
    avail_ += size;
    int64_t s = start, sz = size;
    auto next = free_.lower_bound(s);
    if (next != free_.begin()) {
      auto prev = std::prev(next);
      if (prev->first + prev->second == s) {
        s = prev->first;
        sz += prev->second;
        free_.erase(prev);
      }
    }
    if (next != free_.end() && s + sz == next->first) {
      sz += next->second;
      free_.erase(next);
    }
    free_[s] = sz;
  }

  int64_t Avail() const { return avail_; }
  int64_t Capacity() const { return capacity_; }

 private:
  int64_t capacity_ = 0;
  int64_t avail_ = 0;
  std::map<int64_t, int64_t> free_;  // start -> size
};

// ---------------------------------------------------------------------------
// PageManager: LIFO page pool.
// ---------------------------------------------------------------------------
class PageManagerImpl {
 public:
  void Init(int64_t max_tokens, int64_t page_size) {
    page_size_ = page_size;
    num_pages_ = page_size > 0 ? max_tokens / page_size : 0;
    free_.clear();
    free_.reserve(num_pages_);
    for (int64_t i = num_pages_ - 1; i >= 0; --i) free_.push_back(i);
  }

  bool Alloc(int64_t n, std::vector<int64_t>* out) {
    if (n < 0 || n > static_cast<int64_t>(free_.size())) return false;
    out->assign(free_.end() - n, free_.end());
    free_.resize(free_.size() - n);
    return true;
  }

  void Free(const int64_t* pages, int64_t n) {
    free_.insert(free_.end(), pages, pages + n);
  }

  int64_t Avail() const { return static_cast<int64_t>(free_.size()); }
  int64_t NumPages() const { return num_pages_; }
  int64_t PageSize() const { return page_size_; }

 private:
  int64_t page_size_ = 0;
  int64_t num_pages_ = 0;
  std::vector<int64_t> free_;
};

// ---------------------------------------------------------------------------
// PrefixCacheManager: hash -> (page, refcount), refcount-0 entries in an
// LRU list (oldest evicted first).
// ---------------------------------------------------------------------------
class PrefixCacheImpl {
 public:
  struct Entry {
    int64_t page;
    int64_t refcount;
    std::list<uint64_t>::iterator lru_it;
    bool in_lru;
  };

  int64_t Find(uint64_t hash) const {
    auto it = map_.find(hash);
    return it == map_.end() ? -1 : it->second.page;
  }

  // returns true if inserted fresh; false if hash existed (refcount bumped)
  bool Insert(uint64_t hash, int64_t page) {
    auto it = map_.find(hash);
    if (it != map_.end()) {
      Ref(&it->second);
      return false;
    }
    Entry e;
    e.page = page;
    e.refcount = 1;
    e.in_lru = false;
    map_.emplace(hash, e);
    return true;
  }

  void IncRef(const uint64_t* hashes, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
      auto it = map_.find(hashes[i]);
      if (it == map_.end()) continue;
      Entry* e = &it->second;
      e->refcount++;
      // matches the Python reference: leave the LRU only when the
      // refcount crosses to exactly 1
      if (e->refcount == 1 && e->in_lru) {
        lru_.erase(e->lru_it);
        e->in_lru = false;
      }
    }
  }

  void DecRef(const uint64_t* hashes, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
      auto it = map_.find(hashes[i]);
      if (it == map_.end()) continue;
      Entry* e = &it->second;
      if (--e->refcount <= 0 && !e->in_lru) {
        lru_.push_back(it->first);
        e->lru_it = std::prev(lru_.end());
        e->in_lru = true;
      }
    }
  }

  void Evict(int64_t n, std::vector<int64_t>* out) {
    while (n > 0 && !lru_.empty()) {
      uint64_t hash = lru_.front();
      lru_.pop_front();
      auto it = map_.find(hash);
      if (it != map_.end()) {
        out->push_back(it->second.page);
        map_.erase(it);
      }
      --n;
    }
  }

  void Reset() {
    map_.clear();
    lru_.clear();
  }

  int64_t Size() const { return static_cast<int64_t>(map_.size()); }
  int64_t EvictableCount() const { return static_cast<int64_t>(lru_.size()); }

 private:
  void Ref(Entry* e) {
    e->refcount++;
    if (e->in_lru) {
      lru_.erase(e->lru_it);
      e->in_lru = false;
    }
  }

  std::unordered_map<uint64_t, Entry> map_;
  std::list<uint64_t> lru_;
};

// ---------------------------------------------------------------------------
// Python object wrappers
// ---------------------------------------------------------------------------
struct PyIndexManager {
  PyObject_HEAD
  IndexManagerImpl* impl;
};

struct PyPageManager {
  PyObject_HEAD
  PageManagerImpl* impl;
};

struct PyPrefixCache {
  PyObject_HEAD
  PrefixCacheImpl* impl;
};

// ---- IndexManager methods ----

static int IndexManager_init(PyIndexManager* self, PyObject* args,
                             PyObject* kwds) {
  long long capacity = 0;
  static const char* kwlist[] = {"capacity", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kwds, "|L",
                                   const_cast<char**>(kwlist), &capacity))
    return -1;
  self->impl = new (std::nothrow) IndexManagerImpl();
  if (!self->impl) {
    PyErr_NoMemory();
    return -1;
  }
  self->impl->Init(capacity);
  return 0;
}

static void IndexManager_dealloc(PyIndexManager* self) {
  delete self->impl;
  Py_TYPE(self)->tp_free(reinterpret_cast<PyObject*>(self));
}

static PyObject* IndexManager_initfn(PyIndexManager* self, PyObject* arg) {
  long long capacity = PyLong_AsLongLong(arg);
  if (capacity == -1 && PyErr_Occurred()) return nullptr;
  self->impl->Init(capacity);
  Py_RETURN_NONE;
}

static PyObject* IndexManager_alloc(PyIndexManager* self, PyObject* arg) {
  long long size = PyLong_AsLongLong(arg);
  if (size == -1 && PyErr_Occurred()) return nullptr;
  return PyLong_FromLongLong(self->impl->Alloc(size));
}

static PyObject* IndexManager_free(PyIndexManager* self, PyObject* args) {
  long long start, size;
  if (!PyArg_ParseTuple(args, "LL", &start, &size)) return nullptr;
  self->impl->FreeTracked(start, size);
  Py_RETURN_NONE;
}

static PyObject* IndexManager_avail(PyIndexManager* self, PyObject*) {
  return PyLong_FromLongLong(self->impl->Avail());
}

static PyObject* IndexManager_capacity(PyIndexManager* self, void*) {
  return PyLong_FromLongLong(self->impl->Capacity());
}

static PyMethodDef IndexManager_methods[] = {
    {"init", reinterpret_cast<PyCFunction>(IndexManager_initfn), METH_O, ""},
    {"alloc", reinterpret_cast<PyCFunction>(IndexManager_alloc), METH_O, ""},
    {"free", reinterpret_cast<PyCFunction>(IndexManager_free), METH_VARARGS,
     ""},
    {"get_available_block_num",
     reinterpret_cast<PyCFunction>(IndexManager_avail), METH_NOARGS, ""},
    {nullptr, nullptr, 0, nullptr}};

static PyGetSetDef IndexManager_getset[] = {
    {"capacity", reinterpret_cast<getter>(IndexManager_capacity), nullptr,
     nullptr, nullptr},
    {nullptr, nullptr, nullptr, nullptr, nullptr}};

static PyTypeObject PyIndexManagerType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
};

// ---- PageManager methods ----

static int PageManager_init(PyPageManager* self, PyObject* args,
                            PyObject* kwds) {
  long long max_tokens = 0, page_size = 128;
  static const char* kwlist[] = {"max_tokens", "page_size", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kwds, "|LL",
                                   const_cast<char**>(kwlist), &max_tokens,
                                   &page_size))
    return -1;
  self->impl = new (std::nothrow) PageManagerImpl();
  if (!self->impl) {
    PyErr_NoMemory();
    return -1;
  }
  self->impl->Init(max_tokens, page_size);
  return 0;
}

static void PageManager_dealloc(PyPageManager* self) {
  delete self->impl;
  Py_TYPE(self)->tp_free(reinterpret_cast<PyObject*>(self));
}

static PyObject* PageManager_initfn(PyPageManager* self, PyObject* args) {
  long long max_tokens, page_size;
  if (!PyArg_ParseTuple(args, "LL", &max_tokens, &page_size)) return nullptr;
  self->impl->Init(max_tokens, page_size);
  Py_RETURN_NONE;
}

static PyObject* PageManager_alloc(PyPageManager* self, PyObject* arg) {
  long long n = PyLong_AsLongLong(arg);
  if (n == -1 && PyErr_Occurred()) return nullptr;
  std::vector<int64_t> pages;
  if (!self->impl->Alloc(n, &pages)) Py_RETURN_NONE;
  PyObject* list = PyList_New(pages.size());
  if (!list) return nullptr;
  for (size_t i = 0; i < pages.size(); ++i)
    PyList_SET_ITEM(list, i, PyLong_FromLongLong(pages[i]));
  return list;
}

static PyObject* PageManager_free(PyPageManager* self, PyObject* arg) {
  PyObject* seq = PySequence_Fast(arg, "pages must be a sequence");
  if (!seq) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  std::vector<int64_t> pages(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    pages[i] = PyLong_AsLongLong(PySequence_Fast_GET_ITEM(seq, i));
    if (pages[i] == -1 && PyErr_Occurred()) {
      Py_DECREF(seq);
      return nullptr;
    }
  }
  Py_DECREF(seq);
  self->impl->Free(pages.data(), n);
  Py_RETURN_NONE;
}

static PyObject* PageManager_avail(PyPageManager* self, PyObject*) {
  return PyLong_FromLongLong(self->impl->Avail());
}

static PyObject* PageManager_num_pages(PyPageManager* self, void*) {
  return PyLong_FromLongLong(self->impl->NumPages());
}

static PyObject* PageManager_page_size(PyPageManager* self, void*) {
  return PyLong_FromLongLong(self->impl->PageSize());
}

static PyMethodDef PageManager_methods[] = {
    {"init", reinterpret_cast<PyCFunction>(PageManager_initfn), METH_VARARGS,
     ""},
    {"alloc", reinterpret_cast<PyCFunction>(PageManager_alloc), METH_O, ""},
    {"free", reinterpret_cast<PyCFunction>(PageManager_free), METH_O, ""},
    {"get_avail", reinterpret_cast<PyCFunction>(PageManager_avail),
     METH_NOARGS, ""},
    {nullptr, nullptr, 0, nullptr}};

static PyGetSetDef PageManager_getset[] = {
    {"num_pages", reinterpret_cast<getter>(PageManager_num_pages), nullptr,
     nullptr, nullptr},
    {"page_size", reinterpret_cast<getter>(PageManager_page_size), nullptr,
     nullptr, nullptr},
    {nullptr, nullptr, nullptr, nullptr, nullptr}};

static PyTypeObject PyPageManagerType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
};

// ---- PrefixCacheManager methods ----

static int PrefixCache_init(PyPrefixCache* self, PyObject*, PyObject*) {
  self->impl = new (std::nothrow) PrefixCacheImpl();
  if (!self->impl) {
    PyErr_NoMemory();
    return -1;
  }
  return 0;
}

static void PrefixCache_dealloc(PyPrefixCache* self) {
  delete self->impl;
  Py_TYPE(self)->tp_free(reinterpret_cast<PyObject*>(self));
}

static bool HashVec(PyObject* arg, std::vector<uint64_t>* out) {
  PyObject* seq = PySequence_Fast(arg, "hashes must be a sequence");
  if (!seq) return false;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  out->resize(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    (*out)[i] =
        PyLong_AsUnsignedLongLongMask(PySequence_Fast_GET_ITEM(seq, i));
    if (PyErr_Occurred()) {
      Py_DECREF(seq);
      return false;
    }
  }
  Py_DECREF(seq);
  return true;
}

static PyObject* PrefixCache_find(PyPrefixCache* self, PyObject* arg) {
  uint64_t h = PyLong_AsUnsignedLongLongMask(arg);
  if (PyErr_Occurred()) return nullptr;
  return PyLong_FromLongLong(self->impl->Find(h));
}

static PyObject* PrefixCache_insert(PyPrefixCache* self, PyObject* args) {
  unsigned long long h;
  long long page;
  if (!PyArg_ParseTuple(args, "KL", &h, &page)) return nullptr;
  if (self->impl->Insert(h, page)) Py_RETURN_TRUE;
  Py_RETURN_FALSE;
}

static PyObject* PrefixCache_inc_ref(PyPrefixCache* self, PyObject* arg) {
  std::vector<uint64_t> hs;
  if (!HashVec(arg, &hs)) return nullptr;
  self->impl->IncRef(hs.data(), hs.size());
  Py_RETURN_NONE;
}

static PyObject* PrefixCache_dec_ref(PyPrefixCache* self, PyObject* arg) {
  std::vector<uint64_t> hs;
  if (!HashVec(arg, &hs)) return nullptr;
  self->impl->DecRef(hs.data(), hs.size());
  Py_RETURN_NONE;
}

static PyObject* PrefixCache_evict(PyPrefixCache* self, PyObject* arg) {
  long long n = PyLong_AsLongLong(arg);
  if (n == -1 && PyErr_Occurred()) return nullptr;
  std::vector<int64_t> pages;
  self->impl->Evict(n, &pages);
  PyObject* list = PyList_New(pages.size());
  if (!list) return nullptr;
  for (size_t i = 0; i < pages.size(); ++i)
    PyList_SET_ITEM(list, i, PyLong_FromLongLong(pages[i]));
  return list;
}

static PyObject* PrefixCache_reset(PyPrefixCache* self, PyObject*) {
  self->impl->Reset();
  Py_RETURN_NONE;
}

static Py_ssize_t PrefixCache_len(PyObject* self) {
  return reinterpret_cast<PyPrefixCache*>(self)->impl->Size();
}

static PyObject* PrefixCache_evictable(PyPrefixCache* self, void*) {
  return PyLong_FromLongLong(self->impl->EvictableCount());
}

static PyMethodDef PrefixCache_methods[] = {
    {"find", reinterpret_cast<PyCFunction>(PrefixCache_find), METH_O, ""},
    {"insert", reinterpret_cast<PyCFunction>(PrefixCache_insert),
     METH_VARARGS, ""},
    {"inc_ref_count", reinterpret_cast<PyCFunction>(PrefixCache_inc_ref),
     METH_O, ""},
    {"dec_ref_count", reinterpret_cast<PyCFunction>(PrefixCache_dec_ref),
     METH_O, ""},
    {"evict", reinterpret_cast<PyCFunction>(PrefixCache_evict), METH_O, ""},
    {"reset", reinterpret_cast<PyCFunction>(PrefixCache_reset), METH_NOARGS,
     ""},
    {nullptr, nullptr, 0, nullptr}};

static PyGetSetDef PrefixCache_getset[] = {
    {"evictable_count", reinterpret_cast<getter>(PrefixCache_evictable),
     nullptr, nullptr, nullptr},
    {nullptr, nullptr, nullptr, nullptr, nullptr}};

static PySequenceMethods PrefixCache_as_sequence = {
    PrefixCache_len,  // sq_length
};

static PyTypeObject PyPrefixCacheType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
};

// ---------------------------------------------------------------------------
static PyModuleDef native_module = {
    PyModuleDef_HEAD_INIT,
    "ppl_llm_host",
    "Native host-side data structures for the TPU serving engine.",
    -1,
    nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_ppl_llm_host(void) {
  PyIndexManagerType.tp_name = "ppl_llm_host.IndexManager";
  PyIndexManagerType.tp_basicsize = sizeof(PyIndexManager);
  PyIndexManagerType.tp_flags = Py_TPFLAGS_DEFAULT;
  PyIndexManagerType.tp_new = PyType_GenericNew;
  PyIndexManagerType.tp_init = reinterpret_cast<initproc>(IndexManager_init);
  PyIndexManagerType.tp_dealloc =
      reinterpret_cast<destructor>(IndexManager_dealloc);
  PyIndexManagerType.tp_methods = IndexManager_methods;
  PyIndexManagerType.tp_getset = IndexManager_getset;

  PyPageManagerType.tp_name = "ppl_llm_host.PageManager";
  PyPageManagerType.tp_basicsize = sizeof(PyPageManager);
  PyPageManagerType.tp_flags = Py_TPFLAGS_DEFAULT;
  PyPageManagerType.tp_new = PyType_GenericNew;
  PyPageManagerType.tp_init = reinterpret_cast<initproc>(PageManager_init);
  PyPageManagerType.tp_dealloc =
      reinterpret_cast<destructor>(PageManager_dealloc);
  PyPageManagerType.tp_methods = PageManager_methods;
  PyPageManagerType.tp_getset = PageManager_getset;

  PyPrefixCacheType.tp_name = "ppl_llm_host.PrefixCacheManager";
  PyPrefixCacheType.tp_basicsize = sizeof(PyPrefixCache);
  PyPrefixCacheType.tp_flags = Py_TPFLAGS_DEFAULT;
  PyPrefixCacheType.tp_new = PyType_GenericNew;
  PyPrefixCacheType.tp_init = reinterpret_cast<initproc>(PrefixCache_init);
  PyPrefixCacheType.tp_dealloc =
      reinterpret_cast<destructor>(PrefixCache_dealloc);
  PyPrefixCacheType.tp_methods = PrefixCache_methods;
  PyPrefixCacheType.tp_getset = PrefixCache_getset;
  PyPrefixCacheType.tp_as_sequence = &PrefixCache_as_sequence;

  if (PyType_Ready(&PyIndexManagerType) < 0) return nullptr;
  if (PyType_Ready(&PyPageManagerType) < 0) return nullptr;
  if (PyType_Ready(&PyPrefixCacheType) < 0) return nullptr;

  PyObject* m = PyModule_Create(&native_module);
  if (!m) return nullptr;
  Py_INCREF(&PyIndexManagerType);
  PyModule_AddObject(m, "IndexManager",
                     reinterpret_cast<PyObject*>(&PyIndexManagerType));
  Py_INCREF(&PyPageManagerType);
  PyModule_AddObject(m, "PageManager",
                     reinterpret_cast<PyObject*>(&PyPageManagerType));
  Py_INCREF(&PyPrefixCacheType);
  PyModule_AddObject(m, "PrefixCacheManager",
                     reinterpret_cast<PyObject*>(&PyPrefixCacheType));
  PyModule_AddIntConstant(m, "INVALID_INDEX", kInvalidIndex);
  return m;
}
