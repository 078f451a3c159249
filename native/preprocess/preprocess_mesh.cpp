// PreprocessMesh CLI — native SDF sampling of a mesh file.
//
// Drop-in role of ref src/PreprocessMesh.cpp:282-565 (same flags where
// meaningful): normalize mesh to the unit sphere (buffer 1.03), draw
// num_sample points (47/50 near-surface with two Gaussian shells
// var/var÷10, rest uniform in the bounding cube), compute exact signed
// distances (BVH + fast winding number replaces the GPU
// visible-surface + normal-vote pipeline), write pos/neg npz.
//
//   preprocess_mesh -m mesh.obj -o out.npz [-s 500000] [--var 0.005]
//                   [--seed 0] [--no-normalize]

#include <cstdlib>
#include <cstring>
#include <iostream>
#include <string>
#include <vector>

extern "C" {
void* dsdf_load_mesh(const char* path);
void dsdf_free_mesh(void* handle);
void dsdf_normalize(void* h, float buffer, float* off, float* scale);
int dsdf_sample_sdf(void* h, int n, float var, float ratio, float cube,
                    unsigned long long seed, float* xyz, float* sdf);
int dsdf_write_sdf_npz(const char* path, const float* pos, int n_pos,
                       const float* neg, int n_neg, int legacy);
}

int main(int argc, char** argv) {
  std::string mesh_file, out_file;
  int num_sample = 500000;            // ref :292
  float variance = 0.005f;            // ref :291
  float near_ratio = 47.0f / 50.0f;   // ref :295
  unsigned long long seed = 0;
  bool normalize = true;

  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {  // guard: flag as last argument
      if (i + 1 >= argc) {
        std::cerr << "error: " << a << " needs a value\n";
        std::exit(1);
      }
      return std::string(argv[++i]);
    };
    if (a == "-m") mesh_file = next();
    else if (a == "-o") out_file = next();
    else if (a == "-s") {
      try { num_sample = std::stoi(next()); }
      catch (...) { std::cerr << "error: -s needs an integer\n"; return 1; }
    }
    else if (a == "--var") {
      try { variance = std::stof(next()); }
      catch (...) { std::cerr << "error: --var needs a number\n"; return 1; }
    }
    else if (a == "--seed") {
      try { seed = std::stoull(next()); }
      catch (...) { std::cerr << "error: --seed needs an integer\n"; return 1; }
    }
    else if (a == "--no-normalize") normalize = false;
    else if (a == "-h" || a == "--help") {
      std::cout << "usage: preprocess_mesh -m mesh -o out.npz [-s N] [--var v]"
                   " [--seed s] [--no-normalize]\n";
      return 0;
    }
  }
  if (mesh_file.empty() || out_file.empty()) {
    std::cerr << "error: -m and -o are required\n";
    return 1;
  }

  void* mesh = dsdf_load_mesh(mesh_file.c_str());
  if (!mesh) {
    std::cerr << "error: could not load " << mesh_file << "\n";
    return 1;
  }
  float offset[3], scale = 1.0f;
  if (normalize) dsdf_normalize(mesh, 1.03f, offset, &scale);

  std::vector<float> xyz(3 * (size_t)num_sample), sdf(num_sample);
  int n = dsdf_sample_sdf(mesh, num_sample, variance, near_ratio, 2.0f, seed,
                          xyz.data(), sdf.data());

  std::vector<float> pos, neg;
  for (int i = 0; i < n; i++) {
    auto& dst = (sdf[i] >= 0) ? pos : neg;
    dst.push_back(xyz[3 * i]);
    dst.push_back(xyz[3 * i + 1]);
    dst.push_back(xyz[3 * i + 2]);
    dst.push_back(sdf[i]);
  }
  int rc = dsdf_write_sdf_npz(out_file.c_str(), pos.data(), (int)pos.size() / 4,
                              neg.data(), (int)neg.size() / 4, 1);
  dsdf_free_mesh(mesh);
  std::cout << "wrote " << out_file << " (pos " << pos.size() / 4 << ", neg "
            << neg.size() / 4 << ")\n";
  return rc;
}
