// Headless software rasterizer: the TPU build's native renderer core.
//
// Role-equivalent to the reference's OpenGL engine
// (/root/reference/heligym/envs/renderer/src/gWindow.{h,cpp}, model.{h,cpp},
// mesh.{h,cpp}) but designed for the TPU training workflow: no GPU, no window
// system, no driver — it rasterizes into an in-memory RGB framebuffer that
// Python fetches (`get_frame`), so `rgb_array` rendering works on headless
// pods. Scene/transform/rotor-uniform semantics mirror the reference:
// transforms accumulate and reset to base after each draw (model.cpp:39-76),
// rotor angles are per-model parameters consumed at draw time
// (py_api.cpp:148-157; the reference does the rotor rotation in its vertex
// shader, aw109_vertex.vs:51-72 — here the rasterizer rotates the rotor
// vertex groups on the CPU).
#pragma once
#include <chrono>
#include <cstdint>
#include <string>
#include <vector>

#include "vecmath.h"

namespace sr {

enum VertexGroup : uint8_t { GROUP_BODY = 0, GROUP_MAINROTOR = 1, GROUP_TAILROTOR = 2 };

struct Mesh {
  std::vector<Vec3> positions;
  std::vector<Vec3> normals;
  std::vector<uint32_t> indices;   // triangle list
  std::vector<uint8_t> groups;     // per-vertex rotor group
  std::vector<Vec3> colors;        // optional per-vertex colors (textured)
  Vec3 color{0.8f, 0.8f, 0.8f};
  bool shaded = true;              // false: emissive (sky)
};

struct Model {
  std::vector<Mesh> meshes;
  Mat4 base = Mat4::identity();
  Mat4 model = Mat4::identity();
  Vec3 mainrotor{0, 0, 0};   // (phi, theta, psi) set via rotate_MR
  Vec3 tailrotor{0, 0, 0};
  Vec3 mr_hub{0, 0, 0};      // rotor hub positions in model space
  Vec3 tr_hub{0, 0, 0};

  void translate(const Vec3& t) { model = sr::translate(model, t); }
  void rotate(float angle, const Vec3& axis) { model = sr::rotate(model, angle, axis); }
  void scale(const Vec3& s) { model = sr::scale(model, s); }
};

struct Camera {
  Vec3 position{0, 0, 3};
  Vec3 front{0, 0, -1};
  Vec3 up{0, 1, 0};
  float fov_deg = 45.0f;
  void update_vectors() {}
  Mat4 view() const { return look_at(position, position + front, up); }
};

struct GuiTextItem {
  std::string fmt;   // printf-style with one float slot
  float value = 0;
};

struct GuiTextSection {
  std::string title;
  float pos_x = 0, pos_y = 0;
  std::vector<GuiTextItem> items;
};

struct Window {
  int width, height;
  std::string title;
  bool visible = false;
  bool should_close = false;
  float FPS = 0.0f;
  float FPS_limit = 1e9f;
  std::chrono::steady_clock::time_point last_frame;
  long frame_count = 0;

  std::vector<uint8_t> framebuffer;  // RGB888
  std::vector<float> zbuffer;
  std::vector<Model*> permanent;
  std::vector<Model*> instantaneous;
  std::vector<GuiTextSection> gui_sections;
  Camera* camera;

  // lighting / fog (approximating the reference's UBO values,
  // gWindow.cpp:76-119 and terrain_frag.fs:38-62)
  Vec3 light_dir{0.4f, -0.8f, 0.3f};
  Vec3 light_color{1.0f, 0.98f, 0.92f};
  float ambient = 0.35f;
  Vec3 fog_color{0.74f, 0.80f, 0.88f};
  float fog_density = 0.00025f;

  Window(int w, int h, const char* title);
  ~Window();
  void render();
  void draw_model(Model* m);
  void draw_triangle(const Vec4* clip, const Vec3* world_n, const Vec3* world_p,
                     const Vec3* vcol, bool shaded);
  void clear();
  void draw_text(int x, int y, const std::string& s, uint8_t r, uint8_t g, uint8_t b);
  int create_guiText(const char* title, float x, float y);
};

// model factories ------------------------------------------------------
Model* load_obj(const std::string& path);
Model* make_procedural_heli();
Model* make_sky_dome();
Model* make_terrain(const float* hmap, int h, int w, float ns_size_m,
                    float ew_size_m, float height_scale_m,
                    const float* rgb = nullptr);

}  // namespace sr
