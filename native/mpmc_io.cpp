// Native I/O runtime for mpmc_tpu: fast MPMC-extended PQR trajectory
// codec + OpenDX grid writer.
//
// The reference's entire runtime is C (SURVEY.md §2: input.c/output.c do
// all geometry I/O); this library is the rebuild's native counterpart for
// the I/O hot paths: replaying multi-thousand-frame trajectories and
// appending 10k-atom PQR frames every corrtime are line-parsing/printf
// bound in Python (~100k lines/s) and memory-bandwidth bound here
// (~5M lines/s).  Exposed as a plain C ABI consumed via ctypes
// (mpmc_tpu/io/native.py); the Python implementations remain as the
// reference fallback and are cross-validated in tests.
//
// Column contract (mpmc_tpu/io/pqr.py):
//   ATOM serial name mol_name mol_id flag x y z mass charge polar eps sig
//        [omega c6 c8 c10 gwp_alpha]
// '#'/'!'/'REMARK'/'CRYST' comments; 'END'/'ENDMDL' terminates a frame.

#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "mpmc_common.h"

using mpmc_native::Atom;
using mpmc_native::File;
using mpmc_native::Frame;
using mpmc_native::kNameLen;

namespace {

// split a line into whitespace tokens (in place, zero-copy)
int tokenize(char* line, char** tok, int max_tok) {
    int n = 0;
    char* p = line;
    while (*p && n < max_tok) {
        while (*p && std::isspace(static_cast<unsigned char>(*p))) ++p;
        if (!*p) break;
        tok[n++] = p;
        while (*p && !std::isspace(static_cast<unsigned char>(*p))) ++p;
        if (*p) *p++ = '\0';
    }
    return n;
}

void copy_name(char* dst, const char* src) {
    std::strncpy(dst, src, kNameLen - 1);
    dst[kNameLen - 1] = '\0';
}

// Parse the next frame from f into *out (cleared first).  Returns 1 on
// a frame, 0 at EOF with no frame, -1 on a malformed line (error set).
int read_one_frame(File* file, FILE* f, Frame* out) {
    out->atoms.clear();
    out->has_box = false;
    char line[1024];
    char* tok[24];
    while (std::fgets(line, sizeof line, f)) {
        ++file->lineno;
        // fast-path skip: comments and blank lines
        char* s = line;
        while (*s == ' ' || *s == '\t') ++s;
        if (*s == '\0' || *s == '\n' || *s == '#' || *s == '!') continue;
        if (!std::strncmp(s, "REMARK", 6)) continue;
        if (!std::strncmp(s, "CRYST", 5)) {
            int n = tokenize(line, tok, 24);
            if (n >= 7) {
                for (int k = 0; k < 6; ++k)
                    out->box[k] = std::strtod(tok[k + 1], nullptr);
                out->has_box = true;
            }
            continue;
        }
        if (!std::strncmp(s, "END", 3)) {   // END or ENDMDL
            if (!out->atoms.empty()) return 1;
            continue;
        }
        int n = tokenize(line, tok, 24);
        if (n == 0) continue;
        if (std::strcmp(tok[0], "ATOM") && std::strcmp(tok[0], "HETATM"))
            continue;
        if (n < 14) {
            char buf[128];
            std::snprintf(buf, sizeof buf,
                          "line %ld: ATOM needs >=14 fields, got %d",
                          file->lineno, n);
            file->error = buf;
            return -1;
        }
        Atom a{};
        a.serial = std::strtol(tok[1], nullptr, 10);
        copy_name(a.name, tok[2]);
        copy_name(a.mol_name, tok[3]);
        a.mol_id = std::strtol(tok[4], nullptr, 10);
        a.flag = static_cast<char>(
            std::toupper(static_cast<unsigned char>(tok[5][0])));
        a.x = std::strtod(tok[6], nullptr);
        a.y = std::strtod(tok[7], nullptr);
        a.z = std::strtod(tok[8], nullptr);
        a.mass = std::strtod(tok[9], nullptr);
        a.charge = std::strtod(tok[10], nullptr);
        a.polar = std::strtod(tok[11], nullptr);
        a.eps = std::strtod(tok[12], nullptr);
        a.sig = std::strtod(tok[13], nullptr);
        a.omega = n > 14 ? std::strtod(tok[14], nullptr) : 0.0;
        a.c6 = n > 15 ? std::strtod(tok[15], nullptr) : 0.0;
        a.c8 = n > 16 ? std::strtod(tok[16], nullptr) : 0.0;
        a.c10 = n > 17 ? std::strtod(tok[17], nullptr) : 0.0;
        a.gwp_alpha = n > 18 ? std::strtod(tok[18], nullptr) : 0.0;
        out->atoms.push_back(a);
    }
    return out->atoms.empty() ? 0 : 1;   // EOF flushes a trailing frame
}

}  // namespace

namespace mpmc_native {

Frame* next_frame(File* f) {
    if (f->fp) {
        if (!f->error.empty()) return nullptr;
        int r = read_one_frame(f, f->fp, &f->scratch);
        return r == 1 ? &f->scratch : nullptr;
    }
    if (f->cursor >= f->frames.size()) return nullptr;
    return &f->frames[f->cursor++];
}

void rewind_frames(File* f) { f->cursor = 0; }

}  // namespace mpmc_native

extern "C" {

void* pqr_open(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    auto* file = new File();
    Frame frame;
    int r;
    while ((r = read_one_frame(file, f, &frame)) == 1)
        file->frames.push_back(std::move(frame));
    std::fclose(f);
    return file;   // r == -1: error surfaced via pqr_error()
}

// Streaming handle: constant-memory single-pass iteration for the
// trajectory analyzers (next_frame above).  The random-access API
// (pqr_n_frames/pqr_frame_data) is NOT available on this handle —
// n_frames reports -1.
void* pqr_open_stream(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    auto* file = new File();
    file->fp = f;
    return file;
}

// Advance a STREAMING handle to its next frame (parsed into scratch,
// readable via pqr_frame_natoms/cell/data with i = -1).  Returns the
// frame's atom count, 0 at EOF, -3 on a parse error (pqr_error), -2 on
// an eager handle.
long pqr_stream_advance(void* h) {
    auto* file = static_cast<File*>(h);
    if (!file->fp) return -2;
    Frame* fr = mpmc_native::next_frame(file);
    if (!fr) return file->error.empty() ? 0 : -3;
    return static_cast<long>(fr->atoms.size());
}

const char* pqr_error(void* h) {
    auto* file = static_cast<File*>(h);
    return file->error.empty() ? nullptr : file->error.c_str();
}

long pqr_n_frames(void* h) {
    auto* file = static_cast<File*>(h);
    if (file->fp) return -1;   // streaming: unknown until consumed
    return static_cast<long>(file->frames.size());
}

static const Frame* frame_at(File* file, long i) {
    if (i == -1) return file->fp ? &file->scratch : nullptr;
    if (i < 0 || i >= static_cast<long>(file->frames.size()))
        return nullptr;
    return &file->frames[i];
}

long pqr_frame_natoms(void* h, long i) {
    const Frame* fr = frame_at(static_cast<File*>(h), i);
    return fr ? static_cast<long>(fr->atoms.size()) : -1;
}

// 1 if the frame carried a CRYST record (out = a b c alpha beta gamma).
long pqr_frame_cell(void* h, long i, double* out) {
    const Frame* fr = frame_at(static_cast<File*>(h), i);
    if (!fr || !fr->has_box) return 0;
    for (int k = 0; k < 6; ++k) out[k] = fr->box[k];
    return 1;
}

// Fill caller-allocated buffers: numeric [n,13] doubles (xyz interleaved
// first), ids [n,2] longs, flags [n] chars, names/mol_names [n*8] chars.
long pqr_frame_data(void* h, long i, double* num, long* ids, char* flags,
                    char* names, char* mol_names) {
    const Frame* frp = frame_at(static_cast<File*>(h), i);
    if (!frp) return -1;
    const auto& fr = frp->atoms;
    for (size_t k = 0; k < fr.size(); ++k) {
        const Atom& a = fr[k];
        double* r = num + 13 * k;
        r[0] = a.x; r[1] = a.y; r[2] = a.z; r[3] = a.mass;
        r[4] = a.charge; r[5] = a.polar; r[6] = a.eps; r[7] = a.sig;
        r[8] = a.omega; r[9] = a.c6; r[10] = a.c8; r[11] = a.c10;
        r[12] = a.gwp_alpha;
        ids[2 * k] = a.serial;
        ids[2 * k + 1] = a.mol_id;
        flags[k] = a.flag;
        std::memcpy(names + kNameLen * k, a.name, kNameLen);
        std::memcpy(mol_names + kNameLen * k, a.mol_name, kNameLen);
    }
    return static_cast<long>(fr.size());
}

void pqr_close(void* h) {
    auto* file = static_cast<File*>(h);
    if (file->fp) std::fclose(file->fp);
    delete file;
}

// Append one frame.  mode: "w" or "a".  Returns atoms written, -1 on error.
long pqr_write_frame(const char* path, const char* mode, const char* remark,
                     long n, const double* num, const long* ids,
                     const char* flags, const char* names,
                     const char* mol_names, int extended) {
    FILE* f = std::fopen(path, mode);
    if (!f) return -1;
    if (remark && remark[0]) std::fprintf(f, "REMARK %s\n", remark);
    for (long k = 0; k < n; ++k) {
        const double* r = num + 13 * k;
        std::fprintf(f,
                     "ATOM  %6ld %-5.7s %-5.7s %5ld %c "
                     "%11.5f %11.5f %11.5f %9.4f %10.6f %8.4f "
                     "%10.5f %8.5f",
                     ids[2 * k], names + kNameLen * k,
                     mol_names + kNameLen * k, ids[2 * k + 1], flags[k],
                     r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7]);
        if (extended)
            std::fprintf(f, " %9.5f %11.5f %11.5f %12.5f %8.5f",
                         r[8], r[9], r[10], r[11], r[12]);
        std::fputc('\n', f);
    }
    std::fputs("END\n", f);
    std::fclose(f);
    return n;
}

// OpenDX scalar-field writer (utils/histogram.py format).
long dx_write(const char* path, long nx, long ny, long nz,
              const double* deltas /*[9]*/, const double* data) {
    FILE* f = std::fopen(path, "w");
    if (!f) return -1;
    std::fprintf(f, "object 1 class gridpositions counts %ld %ld %ld\n",
                 nx, ny, nz);
    std::fputs("origin 0.0 0.0 0.0\n", f);
    for (int d = 0; d < 3; ++d)
        std::fprintf(f, "delta %.6f %.6f %.6f\n", deltas[3 * d],
                     deltas[3 * d + 1], deltas[3 * d + 2]);
    std::fprintf(f, "object 2 class gridconnections counts %ld %ld %ld\n",
                 nx, ny, nz);
    long total = nx * ny * nz;
    std::fprintf(f,
                 "object 3 class array type double rank 0 items %ld "
                 "data follows\n", total);
    for (long i = 0; i < total; i += 3) {
        long hi = i + 3 < total ? i + 3 : total;
        for (long j = i; j < hi; ++j)
            std::fprintf(f, j == i ? "%.6e" : " %.6e", data[j]);
        std::fputc('\n', f);
    }
    std::fputs("attribute \"dep\" string \"positions\"\n", f);
    std::fputs("object \"sorbate density\" class field\n", f);
    std::fputs("component \"positions\" value 1\n", f);
    std::fputs("component \"connections\" value 2\n", f);
    std::fputs("component \"data\" value 3\n", f);
    std::fclose(f);
    return total;
}

}  // extern "C"
