// SampleVisibleMeshSurface CLI — surface-sample generator for evaluation.
//
// Drop-in role of ref src/SampleVisibleMeshSurface.cpp:144-324:
// normalize to unit sphere (buffer 1.03), area-weighted surface
// samples (the reference restricted to the camera-visible shell via
// GPU rendering; a closed mesh's full surface is the robust headless
// equivalent), write the PLY point cloud + normalization params npz
// (offset, scale).
//
//   sample_visible_mesh_surface -m mesh.obj -o samples.ply
//                               [-n norm.npz] [-s 30000] [--seed 0]

#include <cstdio>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

extern "C" {
void* dsdf_load_mesh(const char* path);
void dsdf_free_mesh(void* handle);
void dsdf_normalize(void* h, float buffer, float* off, float* scale);
void dsdf_sample_surface(void* h, int n, unsigned long long seed, float* pts);
int dsdf_write_normalization_npz(const char* path, const float* off, float s);
}

int main(int argc, char** argv) {
  std::string mesh_file, ply_out, norm_out;
  int num_sample = 30000;
  unsigned long long seed = 0;
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
    else if (a == "-o") ply_out = next();
    else if (a == "-n") norm_out = next();
    else if (a == "-s") {
      try { num_sample = std::stoi(next()); }
      catch (...) { std::cerr << "error: -s needs an integer\n"; return 1; }
    }
    else if (a == "--seed") {
      try { seed = std::stoull(next()); }
      catch (...) { std::cerr << "error: --seed needs an integer\n"; return 1; }
    }
    else if (a == "-h" || a == "--help") {
      std::cout << "usage: sample_visible_mesh_surface -m mesh -o out.ply"
                   " [-n norm.npz] [-s N] [--seed s]\n";
      return 0;
    }
  }
  if (mesh_file.empty() || ply_out.empty()) {
    std::cerr << "error: -m and -o are required\n";
    return 1;
  }
  void* mesh = dsdf_load_mesh(mesh_file.c_str());
  if (!mesh) {
    std::cerr << "error: could not load " << mesh_file << "\n";
    return 1;
  }
  float offset[3], scale = 1.0f;
  dsdf_normalize(mesh, 1.03f, offset, &scale);

  std::vector<float> pts(3 * (size_t)num_sample);
  dsdf_sample_surface(mesh, num_sample, seed, pts.data());

  // The reference stores surface samples in the ORIGINAL mesh frame
  // (ref src/SampleVisibleMeshSurface.cpp:298-313 re-applies the
  // inverse view/normalization); evaluate.py then maps the normalized
  // reconstruction back via gen/scale - offset. Undo the unit-sphere
  // normalization on the samples accordingly.
  for (int i = 0; i < num_sample; i++)
    for (int k = 0; k < 3; k++)
      pts[3 * (size_t)i + k] = pts[3 * (size_t)i + k] / scale - offset[k];

  std::ofstream out(ply_out, std::ios::binary);
  out << "ply\nformat binary_little_endian 1.0\nelement vertex " << num_sample
      << "\nproperty float x\nproperty float y\nproperty float z\n"
      << "element face 0\nproperty list uchar int vertex_indices\nend_header\n";
  out.write((const char*)pts.data(), pts.size() * sizeof(float));
  out.close();

  if (!norm_out.empty())
    dsdf_write_normalization_npz(norm_out.c_str(), offset, scale);
  dsdf_free_mesh(mesh);
  std::cout << "wrote " << ply_out << " (" << num_sample << " points)\n";
  return 0;
}
