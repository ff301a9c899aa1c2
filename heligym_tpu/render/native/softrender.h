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
//
// Shading follows the reference's fragment shaders and UBO constants:
// Blinn-Phong point light at (0, 1500, 0) with ambient 0.8 / shininess 128
// (gWindow.cpp:92-96, terrain_frag.fs:38-62) and exp2 fog
// visibility = 1 - exp2(-(d * 0.002)^5) (gWindow.cpp:112-117).
#pragma once
#include <chrono>
#include <cstdint>
#include <string>
#include <vector>

#include "vecmath.h"

namespace sr {

enum VertexGroup : uint8_t { GROUP_BODY = 0, GROUP_MAINROTOR = 1, GROUP_TAILROTOR = 2 };

// Equivalent of the reference's stb-loaded GL textures (model.cpp:225-296)
// with GL_LINEAR filtering: bilinear, clamp-to-edge, float RGB.
struct Texture {
  int w = 0, h = 0;
  std::vector<float> rgb;   // h*w*3, row-major, [0,1]
  bool valid() const { return w > 0 && h > 0; }
  Vec3 sample(float u, float v) const {
    // bilinear with clamp-to-edge (texel centers at integer + 0.5)
    float fx = u * w - 0.5f, fy = v * h - 0.5f;
    int x0 = static_cast<int>(std::floor(fx)), y0 = static_cast<int>(std::floor(fy));
    float tx = fx - x0, ty = fy - y0;
    int x1 = x0 + 1, y1 = y0 + 1;
    x0 = x0 < 0 ? 0 : (x0 >= w ? w - 1 : x0);
    x1 = x1 < 0 ? 0 : (x1 >= w ? w - 1 : x1);
    y0 = y0 < 0 ? 0 : (y0 >= h ? h - 1 : y0);
    y1 = y1 < 0 ? 0 : (y1 >= h ? h - 1 : y1);
    auto at = [&](int yy, int xx) -> Vec3 {
      const float* p = &rgb[(static_cast<size_t>(yy) * w + xx) * 3];
      return {p[0], p[1], p[2]};
    };
    Vec3 top = at(y0, x0) * (1.0f - tx) + at(y0, x1) * tx;
    Vec3 bot = at(y1, x0) * (1.0f - tx) + at(y1, x1) * tx;
    return top * (1.0f - ty) + bot * ty;
  }
};

struct Mesh {
  std::vector<Vec3> positions;
  std::vector<Vec3> normals;
  std::vector<uint32_t> indices;   // triangle list
  std::vector<uint8_t> groups;     // per-vertex rotor group
  std::vector<Vec3> colors;        // optional per-vertex colors
  std::vector<Vec2> uvs;           // optional texture coordinates
  Texture texture;                 // optional (valid() == has texture)
  Vec3 color{0.8f, 0.8f, 0.8f};
  bool shaded = true;              // false: emissive (sky)
  // Terrain meshes use the terrain shader's specular (dot(N, H),
  // terrain_frag.fs:55); models reproduce the aw109 shader's quirk of
  // dot(viewDir, halfwayDir) (aw109_frag.fs:55) which is normal-independent.
  bool terrain_spec = false;
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

// Fly camera with the reference's Euler-angle semantics and constants
// (camera.{h,cpp}: MovementSpeed 1.5, MouseSensitivity 0.1, Zoom 45,
// BOOST x50.5, pitch clamp +-89 deg).
enum CameraMovement { CAM_FORWARD = 0, CAM_BACKWARD, CAM_LEFT, CAM_RIGHT,
                      CAM_UP, CAM_DOWN, CAM_BOOST };

struct Camera {
  Vec3 position{0, 0, 3};
  Vec3 front{0, 0, -1};
  Vec3 up{0, 1, 0};
  Vec3 right{1, 0, 0};
  Vec3 world_up{0, 1, 0};
  float yaw = -90.0f, pitch = 0.0f;          // degrees (camera.h:35-36)
  float movement_speed = 1.5f;
  float mouse_sensitivity = 0.1f;
  float fov_deg = 45.0f;                     // reference `Zoom`
  float boost = 1.0f;

  Mat4 view() const { return look_at(position, position + front, up); }
  void update_vectors();                     // camera.cpp:98-109
  void set_front(const Vec3& f);             // syncs yaw/pitch from a vector
  void process_keyboard(int direction, float dt);       // camera.cpp:39-63
  void process_mouse(float dx, float dy, bool constrain_pitch = true);
  void process_scroll(float dy);             // camera.cpp:88-96
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
  int width, height;     // display (output) resolution
  int ss = 2;            // supersampling factor (2 -> 4 samples/px, the
                         // software equivalent of the reference's 4x MSAA
                         // request, gWindow.cpp:8-34)
  int rw, rh;            // internal render resolution (width*ss, height*ss)
  std::string title;
  bool visible = false;
  bool should_close = false;
  float FPS = 0.0f;
  float FPS_limit = 1e9f;
  std::chrono::steady_clock::time_point last_frame;
  long frame_count = 0;
  double sleep_estimate_s = 5e-3;   // preciseSleep state (gWindow.cpp:193-221)
  double sleep_mean_s = 5e-3, sleep_m2_s = 0.0;
  long sleep_count = 1;

  std::vector<uint8_t> framebuffer;  // RGB888 at display resolution
  std::vector<float> colorbuf;       // float RGB at render resolution
  std::vector<float> zbuffer;        // at render resolution
  std::vector<Model*> permanent;
  std::vector<Model*> instantaneous;
  std::vector<GuiTextSection> gui_sections;
  Camera* camera;

  // Lighting / fog: the reference's UBO values (gWindow.cpp:92-117).
  Vec3 light_pos{0.0f, 1500.0f, 0.0f};
  Vec3 light_ambient{0.8f, 0.8f, 0.8f};
  Vec3 light_diffuse{1.0f, 241.0f / 255.0f, 242.0f / 255.0f};
  Vec3 light_specular{1.0f, 1.0f, 1.0f};
  float shininess = 128.0f;
  Vec3 fog_color{0.74f, 0.35f, 0.51f};
  float fog_density = 0.002f;
  float fog_gradient = 5.0f;

  Window(int w, int h, const char* title);
  ~Window();
  void set_supersampling(int factor);
  void render();
  void draw_model(Model* m);
  void draw_triangle(const Vec4* clip, const Vec3* world_n, const Vec3* world_p,
                     const Vec3* vcol, const Vec2* uv, const Mesh& mesh);
  void clear();
  void resolve();   // box-downsample colorbuf -> framebuffer
  void draw_text(int x, int y, const std::string& s, uint8_t r, uint8_t g, uint8_t b);
  int create_guiText(const char* title, float x, float y);
};

// model factories ------------------------------------------------------
Model* load_obj(const std::string& path);
// Zero-dependency image loaders (PPM P6, TGA 24/32-bit raw+RLE, BMP 24-bit
// BI_RGB) behind a path-keyed cache — the equivalent of the reference's
// stb_image-backed texture cache (model.cpp:225-296). Returns nullptr when
// the file is missing or the format unsupported.
const Texture* texture_cache_get(const std::string& path);
Model* make_procedural_heli();
Model* make_sky_dome();
Model* make_terrain(const float* hmap, int h, int w, float ns_size_m,
                    float ew_size_m, float height_scale_m,
                    const float* rgb = nullptr,
                    const float* tex_rgb = nullptr, int th = 0, int tw = 0);

}  // namespace sr
