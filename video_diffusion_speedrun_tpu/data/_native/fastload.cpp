// fastload — native torch.save tensor deserializer (CPython extension).
//
// The reference data path pays a full torch.load per dataset row
// (/root/reference/sharded_dataset.py:8-13). This module parses the
// torch.save container directly in C++ — ZIP central directory (stored
// entries only; torch writes uncompressed), a minimal pickle-protocol-2
// virtual machine covering exactly the opcode set torch emits for plain
// tensors, and a strided copy into a freshly allocated numpy buffer —
// with no torch, no Python-level pickle, and the GIL released during the
// copy. Exposed as fastload.load_tensor(bytes) -> (ndarray, is_bfloat16).
//
// Python fallback: video_diffusion_speedrun_tpu/data/serialization.py
// handles anything this fast path rejects (nested containers, compressed
// entries, exotic dtypes).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// ZIP parsing (stored entries only)
// ---------------------------------------------------------------------------

struct ZipEntry {
  uint64_t offset;  // offset of local header
  uint64_t size;    // uncompressed size
  uint16_t method;  // 0 = stored
};

struct Zip {
  const uint8_t* data;
  size_t len;
  std::map<std::string, ZipEntry> entries;
};

uint16_t rd16(const uint8_t* p) { return (uint16_t)(p[0] | (p[1] << 8)); }
uint32_t rd32(const uint8_t* p) {
  return (uint32_t)(p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24));
}
uint64_t rd64(const uint8_t* p) {
  uint64_t lo = rd32(p), hi = rd32(p + 4);
  return lo | (hi << 32);
}

bool parse_zip(const uint8_t* data, size_t len, Zip* zip, std::string* err) {
  zip->data = data;
  zip->len = len;
  // find end-of-central-directory (scan back past optional comment)
  if (len < 22) { *err = "too small"; return false; }
  size_t scan_limit = len >= 22 + 65536 ? len - 22 - 65536 : 0;
  size_t eocd = SIZE_MAX;
  for (size_t i = len - 22 + 1; i-- > scan_limit;) {
    if (rd32(data + i) == 0x06054b50) { eocd = i; break; }
  }
  if (eocd == SIZE_MAX) { *err = "no EOCD"; return false; }
  uint64_t n_entries = rd16(data + eocd + 10);
  uint64_t cd_offset = rd32(data + eocd + 16);
  // zip64?
  if (cd_offset == 0xFFFFFFFFu || n_entries == 0xFFFF) {
    // EOCD64 locator sits 20 bytes before EOCD
    if (eocd < 20 || rd32(data + eocd - 20) != 0x07064b50) {
      *err = "zip64 locator missing";
      return false;
    }
    uint64_t eocd64 = rd64(data + eocd - 20 + 8);
    // eocd64 is untrusted: subtract-form check, `eocd64 + 56` can wrap
    if (eocd64 > len || len - eocd64 < 56 ||
        rd32(data + eocd64) != 0x06064b50) {
      *err = "bad EOCD64";
      return false;
    }
    n_entries = rd64(data + eocd64 + 32);
    cd_offset = rd64(data + eocd64 + 48);
  }
  if (cd_offset > len) { *err = "central directory out of range"; return false; }
  size_t p = cd_offset;
  for (uint64_t i = 0; i < n_entries; i++) {
    if (p > len || len - p < 46 || rd32(data + p) != 0x02014b50) {
      *err = "bad central directory";
      return false;
    }
    uint16_t method = rd16(data + p + 10);
    uint64_t csize = rd32(data + p + 20);
    uint64_t usize = rd32(data + p + 24);
    uint16_t name_len = rd16(data + p + 28);
    uint16_t extra_len = rd16(data + p + 30);
    uint16_t comment_len = rd16(data + p + 32);
    uint64_t lho = rd32(data + p + 42);
    // Record extents are untrusted: validate before touching name/extra.
    if (len - p - 46 <
        (uint64_t)name_len + (uint64_t)extra_len + (uint64_t)comment_len) {
      *err = "central directory record out of range";
      return false;
    }
    std::string name((const char*)data + p + 46, name_len);
    // zip64 extra field (each rd64 bounded to the declared field size)
    const uint8_t* extra = data + p + 46 + name_len;
    size_t eo = 0;
    while (eo + 4 <= extra_len) {
      uint16_t id = rd16(extra + eo), sz = rd16(extra + eo + 2);
      if (eo + 4 + (size_t)sz > extra_len) break;  // truncated field
      if (id == 0x0001) {
        size_t fo = eo + 4, fend = eo + 4 + sz;
        if (usize == 0xFFFFFFFFu && fo + 8 <= fend) { usize = rd64(extra + fo); fo += 8; }
        if (csize == 0xFFFFFFFFu && fo + 8 <= fend) { csize = rd64(extra + fo); fo += 8; }
        if (lho == 0xFFFFFFFFu && fo + 8 <= fend) { lho = rd64(extra + fo); fo += 8; }
      }
      eo += 4 + sz;
    }
    zip->entries[name] = ZipEntry{lho, usize, method};
    p += 46 + (size_t)name_len + extra_len + comment_len;
  }
  return true;
}

// resolve local header → data pointer
bool zip_read(const Zip& zip, const ZipEntry& e, const uint8_t** out,
              std::string* err) {
  const uint8_t* d = zip.data;
  // offset/size may come from an untrusted zip64 extra field: all range
  // checks in subtract form so `x + k` cannot wrap past the comparison
  if (e.offset > zip.len || zip.len - e.offset < 30 ||
      rd32(d + e.offset) != 0x04034b50) {
    *err = "bad local header";
    return false;
  }
  if (e.method != 0) { *err = "compressed entry (unsupported)"; return false; }
  uint16_t name_len = rd16(d + e.offset + 26);
  uint16_t extra_len = rd16(d + e.offset + 28);
  uint64_t start = e.offset + 30 + (uint64_t)name_len + extra_len;
  if (start > zip.len || e.size > zip.len - start) {
    *err = "entry out of range";
    return false;
  }
  *out = d + start;
  return true;
}

// ---------------------------------------------------------------------------
// minimal pickle VM (protocol ≤ 4, torch tensor subset)
// ---------------------------------------------------------------------------

struct Value;
using ValuePtr = std::shared_ptr<Value>;

struct Value {
  enum Kind {
    kNone, kBool, kInt, kStr, kTuple, kDict, kList, kGlobal, kStorage,
    kTensor, kMark
  } kind;
  bool b = false;
  int64_t i = 0;
  std::string s;                 // Str / Global ("module name")
  std::vector<ValuePtr> items;   // Tuple / List
  // Storage
  std::string storage_dtype, storage_key;
  int64_t storage_numel = 0;
  // Tensor
  ValuePtr storage;
  int64_t offset = 0;
  std::vector<int64_t> shape, strides;
};

ValuePtr mk(Value::Kind k) {
  auto v = std::make_shared<Value>();
  v->kind = k;
  return v;
}

struct Pickle {
  const uint8_t* p;
  const uint8_t* end;
  const uint8_t* begin = nullptr;  // set at construction; bounds the memo
  std::vector<ValuePtr> stack;
  std::vector<ValuePtr> memo;
  std::string err;

  bool fail(const std::string& m) { err = m; return false; }

  bool need(size_t n) {
    if ((size_t)(end - p) < n) { err = "truncated pickle"; return false; }
    return true;
  }

  bool put_memo(size_t idx, ValuePtr v) {
    // idx is untrusted (LONG_BINPUT carries a raw 32-bit index). Every
    // legitimate memo slot costs at least one opcode byte, so the table can
    // never legitimately exceed the pickle's own length — bound it there
    // (with a 1<<20 ceiling; torch tensor pickles use a handful of slots),
    // so a ~10-byte crafted blob can at most force a ~10-entry resize.
    size_t cap = (size_t)(end - begin);
    if (cap > (1u << 20)) cap = 1u << 20;
    if (idx >= cap) return fail("memo index too large");
    if (memo.size() <= idx) memo.resize(idx + 1);
    memo[idx] = v;
    return true;
  }

  bool pop_to_mark(std::vector<ValuePtr>* out) {
    std::vector<ValuePtr> items;
    while (!stack.empty() && stack.back()->kind != Value::kMark) {
      items.push_back(stack.back());
      stack.pop_back();
    }
    if (stack.empty()) return fail("no mark");
    stack.pop_back();  // mark
    out->assign(items.rbegin(), items.rend());
    return true;
  }

  bool reduce() {
    if (stack.size() < 2) return fail("reduce underflow");
    ValuePtr args = stack.back(); stack.pop_back();
    ValuePtr fn = stack.back(); stack.pop_back();
    if (fn->kind != Value::kGlobal) return fail("reduce on non-global");
    if (fn->s == "torch._utils _rebuild_tensor_v2") {
      if (args->kind != Value::kTuple || args->items.size() < 5)
        return fail("bad _rebuild_tensor_v2 args");
      auto t = mk(Value::kTensor);
      t->storage = args->items[0];
      if (t->storage->kind != Value::kStorage)
        return fail("tensor arg0 not storage");
      t->offset = args->items[1]->i;
      for (auto& d : args->items[2]->items) t->shape.push_back(d->i);
      for (auto& d : args->items[3]->items) t->strides.push_back(d->i);
      stack.push_back(t);
      return true;
    }
    if (fn->s == "collections OrderedDict") {
      stack.push_back(mk(Value::kDict));
      return true;
    }
    return fail("unsupported callable: " + fn->s);
  }

  bool persid() {
    if (stack.empty()) return fail("persid underflow");
    ValuePtr pid = stack.back(); stack.pop_back();
    if (pid->kind != Value::kTuple || pid->items.size() < 5 ||
        pid->items[0]->kind != Value::kStr || pid->items[0]->s != "storage")
      return fail("unsupported persistent id");
    auto st = mk(Value::kStorage);
    ValuePtr ty = pid->items[1];
    if (ty->kind != Value::kGlobal) return fail("pid type not global");
    st->storage_dtype = ty->s;  // e.g. "torch BFloat16Storage"
    st->storage_key = pid->items[2]->s;
    st->storage_numel = pid->items[4]->i;
    stack.push_back(st);
    return true;
  }

  bool run() {
    while (p < end) {
      uint8_t op = *p++;
      switch (op) {
        case 0x80:  // PROTO
          if (!need(1)) return false;
          p += 1;
          break;
        case 0x95:  // FRAME
          if (!need(8)) return false;
          p += 8;
          break;
        case '(':  // MARK
          stack.push_back(mk(Value::kMark));
          break;
        case ')':  // EMPTY_TUPLE
          stack.push_back(mk(Value::kTuple));
          break;
        case 'N':
          stack.push_back(mk(Value::kNone));
          break;
        case 0x88: {  // NEWTRUE
          auto v = mk(Value::kBool); v->b = true; stack.push_back(v); break;
        }
        case 0x89: {  // NEWFALSE
          auto v = mk(Value::kBool); v->b = false; stack.push_back(v); break;
        }
        case 'K': {  // BININT1
          if (!need(1)) return false;
          auto v = mk(Value::kInt); v->i = *p++; stack.push_back(v); break;
        }
        case 'M': {  // BININT2
          if (!need(2)) return false;
          auto v = mk(Value::kInt); v->i = rd16(p); p += 2;
          stack.push_back(v); break;
        }
        case 'J': {  // BININT (signed 32)
          if (!need(4)) return false;
          auto v = mk(Value::kInt); v->i = (int32_t)rd32(p); p += 4;
          stack.push_back(v); break;
        }
        case 0x8a: {  // LONG1
          if (!need(1)) return false;
          uint8_t n = *p++;
          if (!need(n) || n > 8) return fail("LONG1 too big");
          int64_t val = 0;
          for (int i = 0; i < n; i++) val |= ((int64_t)p[i]) << (8 * i);
          if (n > 0 && (p[n - 1] & 0x80)) {
            for (int i = n; i < 8; i++) val |= ((int64_t)0xFF) << (8 * i);
          }
          p += n;
          auto v = mk(Value::kInt); v->i = val; stack.push_back(v); break;
        }
        case 0x8c: {  // SHORT_BINUNICODE
          if (!need(1)) return false;
          uint8_t n = *p++;
          if (!need(n)) return false;
          auto v = mk(Value::kStr); v->s.assign((const char*)p, n); p += n;
          stack.push_back(v); break;
        }
        case 'X': {  // BINUNICODE
          if (!need(4)) return false;
          uint32_t n = rd32(p); p += 4;
          if (!need(n)) return false;
          auto v = mk(Value::kStr); v->s.assign((const char*)p, n); p += n;
          stack.push_back(v); break;
        }
        case 'U': {  // SHORT_BINSTRING
          if (!need(1)) return false;
          uint8_t n = *p++;
          if (!need(n)) return false;
          auto v = mk(Value::kStr); v->s.assign((const char*)p, n); p += n;
          stack.push_back(v); break;
        }
        case 'c': {  // GLOBAL: module\nname\n
          std::string mod, name;
          while (p < end && *p != '\n') mod.push_back((char)*p++);
          if (p >= end) return fail("bad GLOBAL");
          p++;
          while (p < end && *p != '\n') name.push_back((char)*p++);
          if (p >= end) return fail("bad GLOBAL");
          p++;
          auto v = mk(Value::kGlobal); v->s = mod + " " + name;
          stack.push_back(v); break;
        }
        case 0x93: {  // STACK_GLOBAL
          if (stack.size() < 2) return fail("stack_global underflow");
          ValuePtr name = stack.back(); stack.pop_back();
          ValuePtr mod = stack.back(); stack.pop_back();
          auto v = mk(Value::kGlobal); v->s = mod->s + " " + name->s;
          stack.push_back(v); break;
        }
        case 'q': {  // BINPUT
          if (!need(1)) return false;
          if (stack.empty()) return fail("memo put on empty stack");
          if (!put_memo(*p++, stack.back())) return false;
          break;
        }
        case 'r': {  // LONG_BINPUT
          if (!need(4)) return false;
          if (stack.empty()) return fail("memo put on empty stack");
          if (!put_memo(rd32(p), stack.back())) return false;
          p += 4;
          break;
        }
        case 0x94:  // MEMOIZE
          if (stack.empty()) return fail("memo put on empty stack");
          if (!put_memo(memo.size(), stack.back())) return false;
          break;
        case 'h': {  // BINGET
          if (!need(1)) return false;
          uint8_t idx = *p++;
          if (idx >= memo.size() || !memo[idx]) return fail("bad memo");
          stack.push_back(memo[idx]); break;
        }
        case 'j': {  // LONG_BINGET
          if (!need(4)) return false;
          uint32_t idx = rd32(p); p += 4;
          if (idx >= memo.size() || !memo[idx]) return fail("bad memo");
          stack.push_back(memo[idx]); break;
        }
        case 't': {  // TUPLE
          std::vector<ValuePtr> items;
          if (!pop_to_mark(&items)) return false;
          auto v = mk(Value::kTuple); v->items = std::move(items);
          stack.push_back(v); break;
        }
        case 0x85: case 0x86: case 0x87: {  // TUPLE1/2/3
          size_t n = op - 0x84;
          if (stack.size() < n) return fail("tuple underflow");
          auto v = mk(Value::kTuple);
          v->items.assign(stack.end() - n, stack.end());
          stack.resize(stack.size() - n);
          stack.push_back(v); break;
        }
        case '}':  // EMPTY_DICT
          stack.push_back(mk(Value::kDict));
          break;
        case ']':  // EMPTY_LIST
          stack.push_back(mk(Value::kList));
          break;
        case 's':  // SETITEM (ignore content)
          if (stack.size() < 3) return fail("setitem underflow");
          stack.pop_back();
          stack.pop_back();
          break;
        case 'u': {  // SETITEMS
          std::vector<ValuePtr> items;
          if (!pop_to_mark(&items)) return false;
          break;
        }
        case 'e': {  // APPENDS
          std::vector<ValuePtr> items;
          if (!pop_to_mark(&items)) return false;
          if (stack.empty() || stack.back()->kind != Value::kList)
            return fail("appends on non-list");
          for (auto& it : items) stack.back()->items.push_back(it);
          break;
        }
        case 'Q':  // BINPERSID
          if (!persid()) return false;
          break;
        case 'R':  // REDUCE
          if (!reduce()) return false;
          break;
        case '.':  // STOP
          if (stack.size() != 1) return fail("stop with bad stack");
          return true;
        default:
          return fail("unsupported opcode " + std::to_string(op));
      }
    }
    return fail("no STOP");
  }
};

// ---------------------------------------------------------------------------
// dtype mapping + array construction
// ---------------------------------------------------------------------------

struct DtypeInfo {
  int npy_type;
  int itemsize;
  bool is_bf16;
};

bool dtype_for(const std::string& storage, DtypeInfo* out) {
  // storage is "torch XStorage"
  if (storage == "torch FloatStorage") { *out = {NPY_FLOAT32, 4, false}; return true; }
  if (storage == "torch DoubleStorage") { *out = {NPY_FLOAT64, 8, false}; return true; }
  if (storage == "torch HalfStorage") { *out = {NPY_FLOAT16, 2, false}; return true; }
  if (storage == "torch BFloat16Storage") { *out = {NPY_UINT16, 2, true}; return true; }
  if (storage == "torch LongStorage") { *out = {NPY_INT64, 8, false}; return true; }
  if (storage == "torch IntStorage") { *out = {NPY_INT32, 4, false}; return true; }
  if (storage == "torch ShortStorage") { *out = {NPY_INT16, 2, false}; return true; }
  if (storage == "torch CharStorage") { *out = {NPY_INT8, 1, false}; return true; }
  if (storage == "torch ByteStorage") { *out = {NPY_UINT8, 1, false}; return true; }
  if (storage == "torch BoolStorage") { *out = {NPY_BOOL, 1, false}; return true; }
  return false;
}

// strided gather from src into dst (C-contiguous), recursion-free
void strided_copy(char* dst, const char* src, const std::vector<int64_t>& shape,
                  const std::vector<int64_t>& strides_elems, int itemsize) {
  size_t ndim = shape.size();
  if (ndim == 0) {
    memcpy(dst, src, itemsize);
    return;
  }
  int64_t total = 1;
  for (auto d : shape) total *= d;
  std::vector<int64_t> idx(ndim, 0);
  for (int64_t n = 0; n < total; n++) {
    int64_t off = 0;
    for (size_t d = 0; d < ndim; d++) off += idx[d] * strides_elems[d];
    memcpy(dst + n * itemsize, src + off * itemsize, itemsize);
    for (size_t d = ndim; d-- > 0;) {
      if (++idx[d] < shape[d]) break;
      idx[d] = 0;
    }
  }
}

bool is_contiguous(const std::vector<int64_t>& shape,
                   const std::vector<int64_t>& strides) {
  int64_t expect = 1;
  for (size_t d = shape.size(); d-- > 0;) {
    if (shape[d] != 1 && strides[d] != expect) return false;
    expect *= shape[d];
  }
  return true;
}

PyObject* load_tensor_impl(PyObject*, PyObject* arg) {
  Py_buffer buf;
  if (PyObject_GetBuffer(arg, &buf, PyBUF_SIMPLE) != 0) return nullptr;
  const uint8_t* data = (const uint8_t*)buf.buf;
  size_t len = (size_t)buf.len;

  Zip zip;
  std::string err;
  if (!parse_zip(data, len, &zip, &err)) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, ("fastload zip: " + err).c_str());
    return nullptr;
  }
  // locate */data.pkl
  std::string prefix, pkl_name;
  for (auto& kv : zip.entries) {
    const std::string& n = kv.first;
    if (n.size() > 9 && n.compare(n.size() - 9, 9, "/data.pkl") == 0) {
      pkl_name = n;
      prefix = n.substr(0, n.size() - 9);
      break;
    }
  }
  if (pkl_name.empty()) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "fastload: no data.pkl");
    return nullptr;
  }
  const uint8_t* pkl;
  const ZipEntry& pe = zip.entries[pkl_name];
  if (!zip_read(zip, pe, &pkl, &err)) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, ("fastload zip: " + err).c_str());
    return nullptr;
  }

  Pickle vm{pkl, pkl + pe.size, pkl};
  if (!vm.run()) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, ("fastload pickle: " + vm.err).c_str());
    return nullptr;
  }
  ValuePtr top = vm.stack.back();
  if (top->kind != Value::kTensor) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "fastload: archive is not a single tensor");
    return nullptr;
  }

  DtypeInfo dt;
  if (!dtype_for(top->storage->storage_dtype, &dt)) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError,
                    ("fastload: dtype " + top->storage->storage_dtype).c_str());
    return nullptr;
  }
  auto it = zip.entries.find(prefix + "/data/" + top->storage->storage_key);
  if (it == zip.entries.end()) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "fastload: storage entry missing");
    return nullptr;
  }
  const uint8_t* storage;
  if (!zip_read(zip, it->second, &storage, &err)) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, ("fastload zip: " + err).c_str());
    return nullptr;
  }

  const std::vector<int64_t>& shape = top->shape;
  std::vector<npy_intp> dims(shape.begin(), shape.end());
  // Bounds: shapes/strides come from an untrusted pickle. Compute the full
  // min/max element offset reachable through (offset, shape, strides) — the
  // contiguous extent offset+total alone does not bound non-contiguous
  // layouts, which would let strided_copy read out of the storage buffer.
  int64_t total = 1;
  bool empty = false;
  for (auto d : shape) {
    if (d < 0) {
      PyBuffer_Release(&buf);
      PyErr_SetString(PyExc_ValueError, "fastload: negative dim");
      return nullptr;
    }
    if (d == 0) empty = true;
    total *= d;
  }
  if (top->strides.size() != shape.size() || top->offset < 0) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "fastload: bad tensor metadata");
    return nullptr;
  }
  // extent check in 128-bit arithmetic: shape/stride/offset come from
  // untrusted pickle bytes, and 64-bit products here can wrap (e.g.
  // stride = 2^61 with itemsize 8 passes a 64-bit "(max_off+1)*itemsize"
  // check and reads far out of bounds)
  __int128 min_off = top->offset, max_off = top->offset;
  if (!empty) {
    for (size_t d = 0; d < shape.size(); d++) {
      __int128 span = (__int128)(shape[d] - 1) * (__int128)top->strides[d];
      if (span >= 0) max_off += span; else min_off += span;
    }
  }
  if (min_off < 0 ||
      (max_off + 1) * (__int128)dt.itemsize > (__int128)it->second.size) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "fastload: storage too small");
    return nullptr;
  }

  PyObject* array = PyArray_SimpleNew((int)dims.size(), dims.data(),
                                      dt.npy_type);
  if (!array) { PyBuffer_Release(&buf); return nullptr; }
  char* dst = (char*)PyArray_DATA((PyArrayObject*)array);
  const char* src = (const char*)storage + top->offset * dt.itemsize;

  Py_BEGIN_ALLOW_THREADS
  if (is_contiguous(shape, top->strides)) {
    memcpy(dst, src, (size_t)total * dt.itemsize);
  } else {
    strided_copy(dst, src, shape, top->strides, dt.itemsize);
  }
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&buf);
  PyObject* result = Py_BuildValue("(NO)", array,
                                   dt.is_bf16 ? Py_True : Py_False);
  return result;
}

PyMethodDef methods[] = {
    {"load_tensor", load_tensor_impl, METH_O,
     "load_tensor(bytes) -> (ndarray, is_bfloat16). Parses a torch.save "
     "archive containing a single tensor."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "fastload",
                      "native torch.save tensor parser", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit_fastload(void) {
  import_array();
  return PyModule_Create(&module);
}
