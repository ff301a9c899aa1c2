// Minimal 3D math for the software rasterizer (no external deps).
// The reference renderer uses glm for the same operations
// (/root/reference/heligym/envs/renderer/src/model.cpp:63-76); this is a
// from-scratch reimplementation of only what the pipeline needs.
#pragma once
#include <cmath>

namespace sr {

struct Vec2 {
  float x = 0, y = 0;
};

struct Vec3 {
  float x = 0, y = 0, z = 0;
  Vec3() = default;
  Vec3(float x_, float y_, float z_) : x(x_), y(y_), z(z_) {}
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(float s) const { return {x * s, y * s, z * s}; }
  Vec3 operator/(float s) const { return {x / s, y / s, z / s}; }
};

inline float dot(const Vec3& a, const Vec3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline float length(const Vec3& a) { return std::sqrt(dot(a, a)); }
inline Vec3 normalize(const Vec3& a) {
  float l = length(a);
  return l > 1e-12f ? a / l : Vec3{0, 0, 0};
}

struct Vec4 {
  float x = 0, y = 0, z = 0, w = 0;
  Vec4() = default;
  Vec4(float x_, float y_, float z_, float w_) : x(x_), y(y_), z(z_), w(w_) {}
  Vec4(const Vec3& v, float w_) : x(v.x), y(v.y), z(v.z), w(w_) {}
};

// Column-major 4x4 matrix, m[col][row] like glm.
struct Mat4 {
  float m[4][4] = {};
  static Mat4 identity() {
    Mat4 r;
    for (int i = 0; i < 4; ++i) r.m[i][i] = 1.0f;
    return r;
  }
};

inline Mat4 operator*(const Mat4& a, const Mat4& b) {
  Mat4 r;
  for (int c = 0; c < 4; ++c)
    for (int rI = 0; rI < 4; ++rI) {
      float s = 0;
      for (int k = 0; k < 4; ++k) s += a.m[k][rI] * b.m[c][k];
      r.m[c][rI] = s;
    }
  return r;
}

inline Vec4 operator*(const Mat4& a, const Vec4& v) {
  Vec4 r;
  r.x = a.m[0][0] * v.x + a.m[1][0] * v.y + a.m[2][0] * v.z + a.m[3][0] * v.w;
  r.y = a.m[0][1] * v.x + a.m[1][1] * v.y + a.m[2][1] * v.z + a.m[3][1] * v.w;
  r.z = a.m[0][2] * v.x + a.m[1][2] * v.y + a.m[2][2] * v.z + a.m[3][2] * v.w;
  r.w = a.m[0][3] * v.x + a.m[1][3] * v.y + a.m[2][3] * v.z + a.m[3][3] * v.w;
  return r;
}

inline Mat4 translate(const Mat4& m, const Vec3& t) {
  Mat4 r = m;
  for (int i = 0; i < 4; ++i)
    r.m[3][i] = m.m[0][i] * t.x + m.m[1][i] * t.y + m.m[2][i] * t.z + m.m[3][i];
  return r;
}

inline Mat4 rotate(const Mat4& m, float angle, const Vec3& axis_in) {
  Vec3 a = normalize(axis_in);
  float c = std::cos(angle), s = std::sin(angle), ic = 1.0f - c;
  Mat4 rot = Mat4::identity();
  rot.m[0][0] = c + a.x * a.x * ic;
  rot.m[0][1] = a.y * a.x * ic + a.z * s;
  rot.m[0][2] = a.z * a.x * ic - a.y * s;
  rot.m[1][0] = a.x * a.y * ic - a.z * s;
  rot.m[1][1] = c + a.y * a.y * ic;
  rot.m[1][2] = a.z * a.y * ic + a.x * s;
  rot.m[2][0] = a.x * a.z * ic + a.y * s;
  rot.m[2][1] = a.y * a.z * ic - a.x * s;
  rot.m[2][2] = c + a.z * a.z * ic;
  return m * rot;
}

inline Mat4 scale(const Mat4& m, const Vec3& s) {
  Mat4 r = m;
  for (int i = 0; i < 4; ++i) {
    r.m[0][i] = m.m[0][i] * s.x;
    r.m[1][i] = m.m[1][i] * s.y;
    r.m[2][i] = m.m[2][i] * s.z;
  }
  return r;
}

inline Mat4 perspective(float fovy, float aspect, float znear, float zfar) {
  float t = std::tan(fovy * 0.5f);
  Mat4 r;
  r.m[0][0] = 1.0f / (aspect * t);
  r.m[1][1] = 1.0f / t;
  r.m[2][2] = -(zfar + znear) / (zfar - znear);
  r.m[2][3] = -1.0f;
  r.m[3][2] = -(2.0f * zfar * znear) / (zfar - znear);
  return r;
}

inline Mat4 look_at(const Vec3& eye, const Vec3& center, const Vec3& up) {
  Vec3 f = normalize(center - eye);
  Vec3 s = normalize(cross(f, up));
  Vec3 u = cross(s, f);
  Mat4 r = Mat4::identity();
  r.m[0][0] = s.x; r.m[1][0] = s.y; r.m[2][0] = s.z;
  r.m[0][1] = u.x; r.m[1][1] = u.y; r.m[2][1] = u.z;
  r.m[0][2] = -f.x; r.m[1][2] = -f.y; r.m[2][2] = -f.z;
  r.m[3][0] = -dot(s, eye);
  r.m[3][1] = -dot(u, eye);
  r.m[3][2] = dot(f, eye);
  return r;
}

// Normal transform: inverse-transpose of the upper-left 3x3.
struct Mat3 {
  float m[3][3] = {};
};

inline Mat3 normal_matrix(const Mat4& mm) {
  float a = mm.m[0][0], b = mm.m[1][0], c = mm.m[2][0];
  float d = mm.m[0][1], e = mm.m[1][1], f = mm.m[2][1];
  float g = mm.m[0][2], h = mm.m[1][2], i = mm.m[2][2];
  float A = e * i - f * h, B = -(d * i - f * g), C = d * h - e * g;
  float D = -(b * i - c * h), E = a * i - c * g, F = -(a * h - b * g);
  float G = b * f - c * e, H = -(a * f - c * d), I = a * e - b * d;
  float det = a * A + b * B + c * C;
  float inv = det != 0 ? 1.0f / det : 0.0f;
  // inverse transpose = adjugate^T / det; rows below are the result rows
  Mat3 r;
  r.m[0][0] = A * inv; r.m[0][1] = B * inv; r.m[0][2] = C * inv;
  r.m[1][0] = D * inv; r.m[1][1] = E * inv; r.m[1][2] = F * inv;
  r.m[2][0] = G * inv; r.m[2][1] = H * inv; r.m[2][2] = I * inv;
  return r;
}

inline Vec3 mul3(const Mat3& m, const Vec3& v) {
  return {m.m[0][0] * v.x + m.m[0][1] * v.y + m.m[0][2] * v.z,
          m.m[1][0] * v.x + m.m[1][1] * v.y + m.m[1][2] * v.z,
          m.m[2][0] * v.x + m.m[2][1] * v.y + m.m[2][2] * v.z};
}

}  // namespace sr
