// Shared in-memory trajectory model for the native runtime
// (libmpmc_io.so): mpmc_io.cpp builds File/Frame/Atom from PQR text;
// mpmc_analyze.cpp consumes them through the opaque handle returned by
// pqr_open.  Column contract documented in mpmc_io.cpp.
#pragma once

#include <cstdio>
#include <string>
#include <vector>

namespace mpmc_native {

constexpr int kNameLen = 8;   // fixed-width strings handed to Python

struct Atom {
    long serial;
    char name[kNameLen];
    char mol_name[kNameLen];
    long mol_id;
    char flag;
    double x, y, z, mass, charge, polar, eps, sig;
    double omega, c6, c8, c10, gwp_alpha;
};

struct Frame {
    std::vector<Atom> atoms;
    bool has_box = false;
    double box[6] = {0, 0, 0, 0, 0, 0};   // a b c alpha beta gamma
};

struct File {
    std::vector<Frame> frames;
    std::string error;
    // Streaming mode (pqr_open_stream): fp != nullptr, frames stays
    // empty, and next_frame() parses one frame at a time into scratch
    // — constant memory for multi-GB trajectories.  All analyzers are
    // single-pass and consume frames ONLY through next_frame().
    std::FILE* fp = nullptr;
    Frame scratch;
    long lineno = 0;
    size_t cursor = 0;    // iteration position (both modes)
};

// One-pass frame iteration over either mode; nullptr at end-of-file or
// on a parse error (distinguish via file->error).  rewind only resets
// the eager cursor — a streaming handle is single-pass by design.
Frame* next_frame(File* f);
void rewind_frames(File* f);

}  // namespace mpmc_native
