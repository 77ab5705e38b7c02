// fastnc — minimal NetCDF-classic (CDF-1/CDF-2) reader with a threaded
// multi-file batch path.
//
// Native-runtime component of noahmp_tpu: the reference's data path is
// NetCDF-Fortran behind an MPI io-rank funnel
// (driver/module_hrldas_netcdf_io.F90); here the hot forcing-read path
// (8 variables per input_timestep, SURVEY §5.8 "double-buffer forcing
// reads on host threads overlapped with device steps") is a C++ codec:
// header parse + big-endian decode + type conversion to float32,
// fanned out across files with std::thread.  Python binds via ctypes
// (no pybind11 in this image); scipy remains the fallback and the
// writer path.
//
// Format reference: NetCDF Classic Format Specification (CDF-1 magic
// "CDF\x01", CDF-2 "CDF\x02" with 64-bit offsets).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <thread>

namespace {

constexpr uint32_t NC_DIMENSION = 0x0A;
constexpr uint32_t NC_VARIABLE = 0x0B;
constexpr uint32_t NC_ATTRIBUTE = 0x0C;

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t off = 0;
  bool ok = true;

  uint32_t u32() {
    if (off + 4 > n) { ok = false; return 0; }
    uint32_t v = (uint32_t(p[off]) << 24) | (uint32_t(p[off + 1]) << 16) |
                 (uint32_t(p[off + 2]) << 8) | uint32_t(p[off + 3]);
    off += 4;
    return v;
  }
  uint64_t u64() {
    uint64_t hi = u32(), lo = u32();
    return (hi << 32) | lo;
  }
  std::string name() {
    uint32_t len = u32();
    if (off + len > n) { ok = false; return {}; }
    std::string s(reinterpret_cast<const char*>(p + off), len);
    off += (len + 3) & ~3u;  // 4-byte padded
    return s;
  }
  void skip(size_t k) {
    if (off + k > n) { ok = false; return; }
    off += k;
  }
};

size_t type_size(uint32_t t) {
  switch (t) {
    case 1: case 2: return 1;  // byte, char
    case 3: return 2;          // short
    case 4: case 5: return 4;  // int, float
    case 6: return 8;          // double
    default: return 0;
  }
}

struct Var {
  std::string name;
  std::vector<uint32_t> dimids;
  uint32_t type = 0;
  uint64_t vsize = 0;
  uint64_t begin = 0;
};

struct NcFile {
  std::vector<uint8_t> bytes;
  uint32_t numrecs = 0;
  bool cdf2 = false;
  std::vector<std::pair<std::string, uint32_t>> dims;
  std::vector<Var> vars;
  bool ok = false;
};

void skip_attrs(Reader& r) {
  uint32_t tag = r.u32();
  uint32_t cnt = r.u32();
  if (tag != NC_ATTRIBUTE && cnt != 0) { r.ok = false; return; }
  for (uint32_t i = 0; i < cnt && r.ok; i++) {
    r.name();
    uint32_t t = r.u32();
    uint32_t nelems = r.u32();
    size_t sz = nelems * type_size(t);
    r.skip((sz + 3) & ~3u);
  }
}

bool parse(NcFile& f) {
  Reader r{f.bytes.data(), f.bytes.size()};
  if (f.bytes.size() < 8 || memcmp(f.bytes.data(), "CDF", 3) != 0)
    return false;
  f.cdf2 = f.bytes[3] == 2;
  if (f.bytes[3] != 1 && f.bytes[3] != 2) return false;
  r.off = 4;
  f.numrecs = r.u32();
  // dim list
  uint32_t tag = r.u32();
  uint32_t cnt = r.u32();
  if (tag == NC_DIMENSION) {
    for (uint32_t i = 0; i < cnt && r.ok; i++) {
      std::string nm = r.name();
      uint32_t sz = r.u32();
      f.dims.emplace_back(nm, sz);
    }
  } else if (cnt != 0) {
    return false;
  }
  skip_attrs(r);
  // var list
  tag = r.u32();
  cnt = r.u32();
  if (tag == NC_VARIABLE) {
    for (uint32_t i = 0; i < cnt && r.ok; i++) {
      Var v;
      v.name = r.name();
      uint32_t nd = r.u32();
      for (uint32_t d = 0; d < nd && r.ok; d++) v.dimids.push_back(r.u32());
      skip_attrs(r);
      v.type = r.u32();
      v.vsize = r.u32();
      v.begin = f.cdf2 ? r.u64() : r.u32();
      f.vars.push_back(std::move(v));
    }
  }
  f.ok = r.ok;
  return r.ok;
}

bool load(const char* path, NcFile& f) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  fseek(fp, 0, SEEK_END);
  long sz = ftell(fp);
  fseek(fp, 0, SEEK_SET);
  if (sz <= 0) { fclose(fp); return false; }
  f.bytes.resize(size_t(sz));
  size_t got = fread(f.bytes.data(), 1, size_t(sz), fp);
  fclose(fp);
  if (got != size_t(sz)) return false;
  return parse(f);
}

// element count of one record (or whole var if not record var)
uint64_t var_elems(const NcFile& f, const Var& v, bool& record) {
  uint64_t elems = 1;
  record = false;
  for (size_t i = 0; i < v.dimids.size(); i++) {
    uint32_t sz = f.dims[v.dimids[i]].second;
    if (sz == 0 && i == 0) { record = true; continue; }
    elems *= sz;
  }
  return elems;
}

// decode one variable fully into float32 (all records)
long read_var_f32(const NcFile& f, const char* varname, float* out,
                  long out_cap) {
  for (const Var& v : f.vars) {
    if (v.name != varname) continue;
    bool record = false;
    uint64_t per_rec = var_elems(f, v, record);
    uint64_t nrec = record ? f.numrecs : 1;
    uint64_t total = per_rec * nrec;
    if ((long)total > out_cap) return -2;
    size_t ts = type_size(v.type);
    if (ts == 0) return -3;
    // record vars are strided by the file's record size; non-record
    // contiguous.  For simplicity handle the common cases: contiguous
    // non-record vars, and record vars where we only need record data
    // laid out at begin + rec*recsize.  Compute recsize as sum over
    // record vars (classic rule: aligned to 4).
    uint64_t recsize = 0;
    if (record) {
      int nrecvars = 0;
      for (const Var& w : f.vars) {
        bool wrec = false;
        uint64_t we = var_elems(f, w, wrec);
        if (wrec) {
          nrecvars++;
          uint64_t b = we * type_size(w.type);
          recsize += (b + 3) & ~3ull;
        }
      }
      if (nrecvars == 1) {
        // special rule: single record variable is not padded
        bool wrec = false;
        recsize = var_elems(f, v, wrec) * ts;
      }
    }
    for (uint64_t rec = 0; rec < nrec; rec++) {
      uint64_t base = v.begin + (record ? rec * recsize : 0);
      if (base + per_rec * ts > f.bytes.size()) return -4;
      const uint8_t* src = f.bytes.data() + base;
      float* dst = out + rec * per_rec;
      switch (v.type) {
        case 5:  // float
          for (uint64_t i = 0; i < per_rec; i++) {
            uint32_t b = (uint32_t(src[4 * i]) << 24) |
                         (uint32_t(src[4 * i + 1]) << 16) |
                         (uint32_t(src[4 * i + 2]) << 8) |
                         uint32_t(src[4 * i + 3]);
            float fv;
            memcpy(&fv, &b, 4);
            dst[i] = fv;
          }
          break;
        case 6:  // double
          for (uint64_t i = 0; i < per_rec; i++) {
            uint64_t b = 0;
            for (int k = 0; k < 8; k++)
              b = (b << 8) | src[8 * i + k];
            double dv;
            memcpy(&dv, &b, 8);
            dst[i] = float(dv);
          }
          break;
        case 4:  // int
          for (uint64_t i = 0; i < per_rec; i++) {
            int32_t b = (int32_t)((uint32_t(src[4 * i]) << 24) |
                                  (uint32_t(src[4 * i + 1]) << 16) |
                                  (uint32_t(src[4 * i + 2]) << 8) |
                                  uint32_t(src[4 * i + 3]));
            dst[i] = float(b);
          }
          break;
        case 3:  // short
          for (uint64_t i = 0; i < per_rec; i++) {
            int16_t b = (int16_t)((uint16_t(src[2 * i]) << 8) |
                                  uint16_t(src[2 * i + 1]));
            dst[i] = float(b);
          }
          break;
        case 1: case 2:
          for (uint64_t i = 0; i < per_rec; i++) dst[i] = float(src[i]);
          break;
        default:
          return -3;
      }
    }
    return long(total);
  }
  return -1;  // not found
}

}  // namespace

extern "C" {

// Read one variable (all records) as float32.  Returns element count,
// or <0 on error (-1 not found, -2 buffer too small, -5 open/parse).
long fastnc_read_var(const char* path, const char* varname, float* out,
                     long out_cap) {
  NcFile f;
  if (!load(path, f)) return -5;
  return read_var_f32(f, varname, out, out_cap);
}

// Read the same set of variables from one file into a packed buffer
// (nvars x var_len each).  Returns 0 on success.
long fastnc_read_vars(const char* path, const char** varnames, int nvars,
                      float* out, long per_var_cap) {
  NcFile f;
  if (!load(path, f)) return -5;
  for (int i = 0; i < nvars; i++) {
    long r = read_var_f32(f, varnames[i], out + (long)i * per_var_cap,
                          per_var_cap);
    if (r < 0) return r;
  }
  return 0;
}

// Threaded batch: read `nvars` variables from each of `npaths` files.
// out layout: [file][var][per_var_cap].  Per-file status in `status`.
void fastnc_read_vars_many(const char** paths, int npaths,
                           const char** varnames, int nvars, float* out,
                           long per_var_cap, long* status) {
  int nthreads = (int)std::thread::hardware_concurrency();
  if (nthreads < 1) nthreads = 1;
  if (nthreads > npaths) nthreads = npaths;
  std::vector<std::thread> ts;
  ts.reserve(nthreads);
  for (int t = 0; t < nthreads; t++) {
    ts.emplace_back([=]() {
      for (int i = t; i < npaths; i += nthreads) {
        status[i] = fastnc_read_vars(
            paths[i], varnames, nvars,
            out + (long)i * nvars * per_var_cap, per_var_cap);
      }
    });
  }
  for (auto& th : ts) th.join();
}

// Variable shape probe: fills shape_out (record dim resolved via
// numrecs), returns ndims or <0.
long fastnc_var_ndims(const char* path, const char* varname,
                      long* shape_out, int max_dims) {
  NcFile f;
  if (!load(path, f)) return -5;
  for (const Var& v : f.vars) {
    if (v.name != varname) continue;
    if ((int)v.dimids.size() > max_dims) return -2;
    for (size_t i = 0; i < v.dimids.size(); i++) {
      uint32_t sz = f.dims[v.dimids[i]].second;
      shape_out[i] = (sz == 0) ? (long)f.numrecs : (long)sz;
    }
    return (long)v.dimids.size();
  }
  return -1;
}

}  // extern "C"
