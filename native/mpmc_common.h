// Shared in-memory trajectory model for the native runtime
// (libmpmc_io.so): mpmc_io.cpp builds File/Frame/Atom from PQR text;
// mpmc_analyze.cpp consumes them through the opaque handle returned by
// pqr_open.  Column contract documented in mpmc_io.cpp.
#pragma once

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
};

}  // namespace mpmc_native
