// Flat C ABI for the software renderer, mirroring the reference's 25-function
// surface (/root/reference/heligym/envs/renderer/src/py_api.h:17-90) plus
// headless extensions (`get_frame`, `create_terrain_model`,
// `create_procedural_model`) so frames can be fetched without a window system.
#include <cstring>
#include <string>

#include "softrender.h"

using sr::Model;
using sr::Window;

extern "C" {

Window* create_window(unsigned int width, unsigned int height, const char* title) {
  return new Window(static_cast<int>(width), static_cast<int>(height), title);
}

void render(Window* w) { w->render(); }

void close(Window* w) { w->should_close = true; }

bool is_close(Window* w) { return w->should_close; }

void terminate() {}

void destroy_window(Window* w) { delete w; }

Model* create_model(const char* model_path, const char* /*vs_path*/,
                    const char* /*fs_path*/) {
  // shader paths accepted for reference-API compatibility; the software
  // pipeline has fixed shading.
  std::string path = model_path ? model_path : "";
  if (path.rfind("procedural://heli", 0) == 0 ||
      path.find(".obj") == std::string::npos) {
    if (path.find("sky") != std::string::npos) return sr::make_sky_dome();
    return sr::make_procedural_heli();
  }
  if (path.find("sky") != std::string::npos) return sr::make_sky_dome();
  Model* m = sr::load_obj(path);
  return m ? m : sr::make_procedural_heli();
}

Model* create_procedural_model(const char* kind) {
  std::string k = kind ? kind : "";
  if (k == "sky") return sr::make_sky_dome();
  return sr::make_procedural_heli();
}

Model* create_terrain_model(const float* hmap, int h, int w, float ns_size_m,
                            float ew_size_m, float height_scale_m) {
  return sr::make_terrain(hmap, h, w, ns_size_m, ew_size_m, height_scale_m);
}

Model* create_terrain_model_textured(const float* hmap, const float* rgb,
                                     int h, int w, float ns_size_m,
                                     float ew_size_m, float height_scale_m) {
  return sr::make_terrain(hmap, h, w, ns_size_m, ew_size_m, height_scale_m, rgb);
}

// Full-resolution bilinear terrain texture: `tex` is (th, tw, 3) float RGB
// sampled per fragment (the software analogue of the reference's GL_LINEAR
// terrain_texture.png, model.cpp:225-296), independent of the mesh grid.
Model* create_terrain_model_textured2(const float* hmap, int h, int w,
                                      float ns_size_m, float ew_size_m,
                                      float height_scale_m, const float* tex,
                                      int th, int tw) {
  return sr::make_terrain(hmap, h, w, ns_size_m, ew_size_m, height_scale_m,
                          nullptr, tex, th, tw);
}

void destroy_model(Model* m) { delete m; }

void add_permanent_to_window(Window* w, Model* m) { w->permanent.push_back(m); }

void add_instantaneous_to_window(Window* w, Model* m) {
  w->instantaneous.push_back(m);
}

void translate_model(Model* m, float x, float y, float z) {
  m->translate({x, y, z});
}

void rotate_model(Model* m, float angle, float x, float y, float z) {
  m->rotate(angle, {x, y, z});
}

void scale_model(Model* m, float x, float y, float z) { m->scale({x, y, z}); }

float get_fps(Window* w) { return w->FPS; }

void set_fps(Window* w, float fps) { w->FPS_limit = fps; }

sr::Camera* get_camera(Window* w) { return w->camera; }

void set_camera_pos(sr::Camera* c, float x, float y, float z) {
  c->position = {x, y, z};
  c->update_vectors();
}

float* get_camera_pos(sr::Camera* c) { return &c->position.x; }

void set_camera_look_at(sr::Camera* c, float x, float y, float z) {
  c->set_front(sr::Vec3{x, y, z} - c->position);
}

// Fly-camera input surface, mirroring the reference's event handlers
// (camera.cpp:39-96 via gWindow.cpp:260-309): direction is the
// Camera_Movement enum order FORWARD..BOOST.
void camera_process_keyboard(sr::Camera* c, int direction, float dt) {
  c->process_keyboard(direction, dt);
}

void camera_process_mouse(sr::Camera* c, float dx, float dy,
                          bool constrain_pitch) {
  c->process_mouse(dx, dy, constrain_pitch);
}

void camera_process_scroll(sr::Camera* c, float dy) { c->process_scroll(dy); }

float get_camera_zoom(sr::Camera* c) { return c->fov_deg; }

// SSAA factor (1 = off, 2 = 4 samples/px ~= the reference's 4x MSAA request)
void set_supersampling(Window* w, int factor) { w->set_supersampling(factor); }

bool is_visible(Window* w) { return w->visible; }

void hide_window(Window* w) { w->visible = false; }

void show_window(Window* w) { w->visible = true; }

int create_guiTextVector(Window* w, const char* title, float pos_x, float pos_y,
                         float /*size_x*/, float /*size_y*/) {
  return w->create_guiText(title, pos_x, pos_y);
}

void add_guiText(Window* w, int section, int size, char** strs, float* vals) {
  if (section < 0 || section >= static_cast<int>(w->gui_sections.size())) return;
  for (int i = 0; i < size; ++i) {
    sr::GuiTextItem item;
    item.fmt = strs[i] ? strs[i] : "";
    item.value = vals ? vals[i] : 0.0f;
    w->gui_sections[section].items.push_back(std::move(item));
  }
}

void set_guiText(Window* w, int section, float* vals) {
  if (section < 0 || section >= static_cast<int>(w->gui_sections.size())) return;
  auto& items = w->gui_sections[section].items;
  for (size_t i = 0; i < items.size(); ++i) items[i].value = vals[i];
}

void rotate_MR(Model* m, float phi, float theta, float psi) {
  m->mainrotor = {phi, theta, psi};
}

void rotate_TR(Model* m, float phi, float theta, float psi) {
  m->tailrotor = {phi, theta, psi};
}

// headless frame fetch: copies the RGB888 framebuffer into `out`
// (size width*height*3)
void get_frame(Window* w, unsigned char* out) {
  std::memcpy(out, w->framebuffer.data(), w->framebuffer.size());
}

int get_width(Window* w) { return w->width; }
int get_height(Window* w) { return w->height; }

}  // extern "C"
